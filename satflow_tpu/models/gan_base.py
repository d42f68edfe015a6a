"""GANBase: shared plumbing for two-network adversarial task models.

The functional analog of the reference's manual two-optimizer Lightning modules
(reference satflow/models/cloudgan.py:244-248, pix2pix.py:128-181): generator and
discriminator are separate flax modules with separate params/optimizers; both
loss functions are pure and get jitted into ONE train step
(satflow_tpu/train/steps.py:make_gan_train_step).

Model state layout: ``{"g": {<collections>}, "d": {<collections>}}`` — spectral
norm u-vectors and batch stats thread through explicitly.

Note: the reference scores fakes as real in its discriminator losses
(pix2pix.py:119, cloudgan.py:266 — SURVEY §2.8 defect 4). This rebuild implements
the correct labels.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from satflow_tpu.models.base import BaseModel, STATE_COLLECTIONS, _rngs
from satflow_tpu.nn.losses import GANLoss


class GANBase(BaseModel):
    is_gan = True

    def __init__(
        self,
        gen_lr: float = 2e-4,
        disc_lr: float = 2e-4,
        gan_mode: str = "vanilla",
        lambda_l1: float = 100.0,
        beta1: float = 0.5,
        beta2: float = 0.999,
        **kwargs,
    ):
        self.gen_lr = gen_lr
        self.disc_lr = disc_lr
        self.gan_mode = gan_mode
        self.lambda_l1 = lambda_l1
        self.beta1 = beta1
        self.beta2 = beta2
        self.adv_loss = GANLoss(gan_mode)
        kwargs.setdefault("lr", gen_lr)
        super().__init__(**kwargs)
        self.disc_module = self.build_discriminator()

    # -- subclass hooks ------------------------------------------------------

    def build_module(self) -> nn.Module:  # generator
        raise NotImplementedError

    def build_discriminator(self) -> nn.Module:
        raise NotImplementedError

    def generate(self, g_vars, x, rng, train: bool):
        """Run the generator; returns (y_hat, new_g_state)."""
        mutable = [k for k in g_vars if k != "params"] if train else False
        out = self.module.apply(g_vars, x, train=train, rngs=_rngs(rng), mutable=mutable)
        if train:
            return out
        return out, {k: v for k, v in g_vars.items() if k != "params"}

    def disc_input(self, x, y):
        """Build the discriminator input from condition + candidate frames."""
        raise NotImplementedError

    def discriminate(self, d_vars, inp, train: bool):
        mutable = [k for k in d_vars if k != "params"] if train else False
        out = self.disc_module.apply(d_vars, inp, train=train, mutable=mutable)
        if train:
            return out
        return out, {k: v for k, v in d_vars.items() if k != "params"}

    # -- engine interface ----------------------------------------------------

    def init_gan_variables(self, rng, batch):
        x, y = self.prepare_batch(batch)
        g_rng, d_rng, s_rng = jax.random.split(rng, 3)
        g_vars = self.module.init(dict(params=g_rng, **(_rngs(s_rng) or {})), x)
        g_params, g_state = self.split_variables(g_vars)
        y_hat, _ = self.generate({"params": g_params, **g_state}, x, s_rng, train=False)
        d_vars = self.disc_module.init(d_rng, self.disc_input(x, y_hat))
        return g_vars, d_vars

    def _unpack_state(self, model_state):
        return model_state.get("g", {}), model_state.get("d", {})

    def generator_loss(self, g_params, d_params, model_state, batch, rng):
        x, y = self.prepare_batch(batch)
        g_state, d_state = self._unpack_state(model_state)
        y_hat, new_g_state = self.generate(
            {"params": g_params, **g_state}, x, rng, train=True
        )
        # The discriminator scores fakes in TRAIN mode (batch-stats
        # normalization) so G optimizes against the same function D trains
        # with — the reference's Lightning module stays in train mode for the
        # G step (reference pix2pix.py:128-150). Its state updates are
        # DISCARDED: only the D optimizer's own step advances running stats.
        score, _ = self.discriminate(
            {"params": d_params, **d_state}, self.disc_input(x, y_hat), train=True
        )
        adv = self.adv_loss(score, True)
        recon = self.criterion(y_hat, y)
        loss = adv + self.lambda_l1 * recon
        metrics = {"loss": loss, "adv_loss": adv, "recon_loss": recon,
                   **self.frame_metrics(y_hat, y)}
        return loss, (metrics, {"g": new_g_state, "d": d_state})

    def discriminator_loss(self, g_params, d_params, model_state, batch, rng, rng_gp):
        x, y = self.prepare_batch(batch)
        g_state, d_state = self._unpack_state(model_state)
        y_hat, _ = self.generate({"params": g_params, **g_state}, x, rng, train=False)
        y_hat = jax.lax.stop_gradient(y_hat)
        d_vars = {"params": d_params, **d_state}
        real_score, new_d_state = self.discriminate(
            d_vars, self.disc_input(x, y), train=True
        )
        d_vars2 = {"params": d_params, **new_d_state}
        fake_score, new_d_state = self.discriminate(
            d_vars2, self.disc_input(x, y_hat), train=True
        )
        loss_real = self.adv_loss(real_score, True)
        loss_fake = self.adv_loss(fake_score, False)  # correct labels (defect 4)
        loss = 0.5 * (loss_real + loss_fake)
        if self.gan_mode == "wgangp":
            from satflow_tpu.nn.losses import gradient_penalty

            def critic(candidate):
                score, _ = self.discriminate(
                    d_vars, self.disc_input(x, candidate), train=False
                )
                return score

            loss = loss + gradient_penalty(
                critic, y, y_hat, rng_gp
            )
        metrics = {"loss": loss, "real_loss": loss_real, "fake_loss": loss_fake}
        return loss, (metrics, {"g": g_state, "d": new_d_state})

    def make_optimizers(self) -> Tuple[optax.GradientTransformation, optax.GradientTransformation]:
        """Two Adam optimizers with the configured LR schedule.

        The ``scheduler`` ctor arg ('plateau'/'cosine'/'warmup', reference
        cloudgan.py:335-362) is honored: cosine/warmup become optax schedules
        inside ``inject_hyperparams``; plateau keeps a constant injected LR that
        the engine's PlateauScheduler rewrites on validation plateaus.
        """
        from satflow_tpu.train.schedules import make_schedule

        sched = getattr(self, "scheduler", None)
        total = getattr(self, "total_steps", 100_000)

        def make(lr):
            if sched in ("cosine", "warmup", "warmup_cosine"):
                name = "warmup_cosine" if sched == "warmup" else sched
                lr = make_schedule(name, lr, total_steps=total)
            return optax.inject_hyperparams(optax.adam)(
                learning_rate=lr, b1=self.beta1, b2=self.beta2
            )

        return make(self.gen_lr), make(self.disc_lr)

    def hparams(self) -> Dict[str, Any]:
        hp = super().hparams()
        hp.update(gen_lr=self.gen_lr, disc_lr=self.disc_lr, gan_mode=self.gan_mode,
                  lambda_l1=self.lambda_l1)
        return hp
