"""Experiment driver: config → datamodule + model + trainer → fit/test → metric.

Parity with reference satflow/experiments/train.py:21-98: seed, instantiate the
datamodule/model/callbacks/loggers/trainer from the composed config, fit, test
(unless fast_dev_run), and return the optimized metric for hyperparameter sweeps.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from satflow_tpu.core.config import instantiate
from satflow_tpu.core.utils import get_logger, log_hyperparameters, seed_everything

log = get_logger(__name__)


def train(config: Dict[str, Any]) -> Optional[float]:
    import satflow_tpu.models  # noqa: F401 - populate the registry
    from satflow_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()

    # debug harness: jax NaN checking (the reference's terminate_on_nan +
    # detect_anomaly analogs, SURVEY §5.2)
    if config.get("debug") or (config.get("trainer") or {}).get("detect_anomaly"):
        import jax

        jax.config.update("jax_debug_nans", True)

    seed_everything(config.get("seed"))

    log.info("Instantiating datamodule <%s>", config["datamodule"].get("_target_"))
    datamodule = instantiate(config["datamodule"])

    log.info("Instantiating model <%s>", config["model"].get("_target_"))
    model = instantiate(config["model"])

    callbacks: List[Any] = []
    for cb_name, cb_conf in (config.get("callbacks") or {}).items():
        if isinstance(cb_conf, dict) and "_target_" in cb_conf:
            log.info("Instantiating callback <%s>", cb_conf["_target_"])
            callbacks.append(instantiate(cb_conf))

    loggers: List[Any] = []
    for lg_name, lg_conf in (config.get("logger") or {}).items():
        if isinstance(lg_conf, dict) and "_target_" in lg_conf:
            log.info("Instantiating logger <%s>", lg_conf["_target_"])
            loggers.append(instantiate(lg_conf))

    trainer_conf = dict(config.get("trainer") or {})
    trainer_conf.pop("_target_", None)
    from satflow_tpu.train.engine import Trainer

    trainer = Trainer(
        **trainer_conf,
        callbacks=callbacks,
        logger=loggers,
        seed=config.get("seed", 0),
    )

    if trainer_conf.get("auto_lr_find") or trainer_conf.get("auto_scale_batch_size"):
        log.info("Running trainer.tune (reference train.py:81-83)")
        trainer.tune(
            model,
            datamodule,
            auto_lr_find=bool(trainer_conf.get("auto_lr_find")),
            auto_scale_batch_size=bool(trainer_conf.get("auto_scale_batch_size")),
        )

    log.info("Starting training")
    trainer.fit(model, datamodule)
    if hasattr(trainer, "state") and trainer.state is not None:
        params = (
            trainer.state.params
            if hasattr(trainer.state, "params")
            else trainer.state.g_params
        )
        log_hyperparameters(config, params, loggers)

    if not trainer_conf.get("fast_dev_run"):
        log.info("Starting testing")
        trainer.test(model, datamodule)

    for cb in callbacks:
        best = getattr(cb, "best_model_path", None)
        if best:
            log.info("Best checkpoint: %s", best)

    metric = config.get("optimized_metric")
    if metric and metric in trainer.callback_metrics:
        return float(trainer.callback_metrics[metric])
    return None
