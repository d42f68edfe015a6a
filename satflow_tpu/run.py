"""CLI entry: ``python -m satflow_tpu.run [overrides...]``.

Parity with reference satflow/run.py:13-40 — compose the config tree from
``satflow_tpu/configs`` with Hydra-style overrides, apply ``extras`` consistency
surgery, pretty-print, and launch the experiment driver. Also supports
``--multirun``-style sweeps via the hparams_search group (see
satflow_tpu/experiments/sweep.py).

Examples:
    python -m satflow_tpu.run model=convlstm datamodule=fake trainer=minimal
    python -m satflow_tpu.run model=metnet trainer.max_epochs=5 model.lr=1e-4
"""

from __future__ import annotations

import sys
from typing import List, Optional

from satflow_tpu.core.config import compose, default_config_dir
from satflow_tpu.core.utils import (
    extras,
    get_logger,
    print_config,
    setup_compilation_cache,
)

log = get_logger(__name__)


def main(argv: Optional[List[str]] = None) -> Optional[float]:
    argv = list(sys.argv[1:] if argv is None else argv)
    setup_compilation_cache()
    try:
        from dotenv import load_dotenv

        load_dotenv()
    except ImportError:
        pass

    multirun = "--multirun" in argv or "-m" in argv
    argv = [a for a in argv if a not in ("--multirun", "-m")]

    config = compose(default_config_dir(), "config.yaml", argv)
    config = extras(config)
    _enter_run_dir(config)
    if config.get("print_config", True):
        print_config(config)

    if multirun and config.get("hparams_search"):
        from satflow_tpu.experiments.sweep import sweep

        # CLI overrides are already baked into config by compose() above
        return sweep(config)

    from satflow_tpu.experiments.train import train

    return train(config)


def _enter_run_dir(config) -> None:
    """Chdir into a per-run output dir (the reference's hydra run-dir hijack,
    configs/hydra/default.yaml:2-3: logs/runs/<date>/<time>). Disable with
    work_dir=null."""
    import datetime
    import os

    work_dir = config.get("work_dir")
    if not work_dir:
        return
    now = datetime.datetime.now()
    run_dir = os.path.join(
        work_dir, now.strftime("%Y-%m-%d"), now.strftime("%H-%M-%S")
    )
    os.makedirs(run_dir, exist_ok=True)
    log.info("Run dir: %s", os.path.abspath(run_dir))
    os.chdir(run_dir)


if __name__ == "__main__":
    main()
