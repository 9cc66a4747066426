"""Adversarial losses: {standard, least-squares} x {normal, relativistic,
relativistic-average}, for both the D and G directions.

Reference semantics (src/loss.py:59-112) with its execution quirk handled
explicitly: the reference's ``cal_loss`` uses MSE when ``ls=False`` and
BCE-with-logits when ``ls=True`` — inverted relative to the flag name —
and the engine passes ``ls=(args.D_loss_fn == "leastsqure")`` [sic typo,
src/cgan.py:147], which is always False. So the reference *always runs
least-squares (MSE) loss with labels real=1 / fake=0*, regardless of the
``--D-loss-fn`` flag.

``mode="reference"`` (default) reproduces exactly what the reference
executes for any flag combination. ``mode="corrected"`` gives the loss
the flag names actually promise (leastsquare -> MSE with fake=-1... the
reference would use fake_label=-1 *with BCE*, which is nonsense; the
corrected mode uses standard -> BCE fake=0, leastsquare -> MSE fake=0).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import optax


@dataclass(frozen=True)
class AdversarialLoss:
    """Configured adversarial loss.

    ls:   "least-squares" flag as the engine computes it
          (reference always False due to the typo).
    rel:  relativistic (RpGAN).
    avg:  relativistic-average (RaGAN); only meaningful with rel=True.
    mode: "reference" (bug-compatible) or "corrected".
    """

    ls: bool = False
    rel: bool = False
    avg: bool = False
    mode: str = "reference"

    def _labels(self) -> tuple[float, float]:
        if self.mode == "reference":
            # reference: fake_label = -1 when ls else 0 (src/loss.py:70-74)
            return (1.0, -1.0 if self.ls else 0.0)
        return (1.0, 0.0)

    def _cal(self, c_out: jnp.ndarray, label: float) -> jnp.ndarray:
        c_out = c_out.astype(  # loss math in >=f32 under bf16
            jnp.promote_types(c_out.dtype, jnp.float32))
        target = jnp.full_like(c_out, label)
        if self.mode == "reference":
            use_mse = not self.ls  # the reference's inverted branch
        else:
            use_mse = self.ls
        if use_mse:
            return jnp.mean((c_out - target) ** 2)
        return jnp.mean(
            optax.sigmoid_binary_cross_entropy(c_out, target))

    def d_loss(self, c_real: jnp.ndarray, c_fake: jnp.ndarray):
        """Discriminator objective (reference forward, D_loss=True)."""
        acc = jnp.promote_types(c_real.dtype, jnp.float32)
        c_real = c_real.astype(acc)
        c_fake = c_fake.astype(acc)
        real_l, fake_l = self._labels()
        if self.rel:
            if self.avg:  # RaGAN
                lr = self._cal(c_real - c_fake.mean(axis=0), real_l)
                lf = self._cal(c_fake - c_real.mean(axis=0), fake_l)
                return (lr + lf) * 0.5
            return self._cal(c_real - c_fake, real_l)  # RpGAN
        lr = self._cal(c_real, real_l)  # SGAN
        lf = self._cal(c_fake, fake_l)
        return (lr + lf) * 0.5

    def g_loss(self, c_real: jnp.ndarray, c_fake: jnp.ndarray):
        """Generator objective (reference forward, D_loss=False)."""
        acc = jnp.promote_types(c_real.dtype, jnp.float32)
        c_real = c_real.astype(acc)
        c_fake = c_fake.astype(acc)
        real_l, fake_l = self._labels()
        if self.rel:
            if self.avg:  # RaGAN
                lf = self._cal(c_fake - c_real.mean(axis=0), real_l)
                lr = self._cal(c_real - c_fake.mean(axis=0), fake_l)
                return (lr + lf) * 0.5
            return self._cal(c_fake - c_real, real_l)  # RpGAN
        return self._cal(c_fake, real_l)  # SGAN


def make_adversarial_loss(d_loss_fn: str, d_type: str,
                          mode: str = "reference") -> AdversarialLoss:
    """Build from the CLI flags, reproducing the engine's wiring.

    Reference: src/cgan.py:146-149 — note the "leastsqure" typo makes
    ``ls`` always False there; in reference mode we reproduce that by
    comparing against the same misspelling.
    """
    if mode == "reference":
        ls = d_loss_fn == "leastsqure"  # [sic] always False, as executed
    else:
        ls = d_loss_fn == "leastsquare"
    return AdversarialLoss(ls=ls, rel="rel" in d_type, avg="avg" in d_type,
                           mode=mode)
