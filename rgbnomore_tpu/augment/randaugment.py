"""Batched RandAugment in the DCT domain.

Re-design of ``utils/custom_transforms.py:944-1127`` for SPMD execution: the
op for each sample each round is drawn with ``jax.random`` and dispatched via
``lax.switch`` under ``vmap`` — XLA evaluates the (cheap, elementwise) op
branches and selects per sample, keeping shapes static and the whole policy
inside the jitted step.

Fidelity notes:
- The DCT magnitude table matches ``custom_transforms.py:1066-1092`` exactly
  (Solarize +-818, SolarizeAdd 883, Cutout 0-6 blocks, Shear 0-17 deg,
  Translate 150/336 * grid).  Magnitudes are static (fixed by ``magnitude``);
  only the sign is random for signed ops.
- The grayscale/chroma mutual-exclusion rule (``:1111-1119``) is implemented
  as a per-sample allowed-mask updated between rounds — the same sequential
  semantics as the reference's mutating ops_list.
- Values stay float32; each op clamps to [-1024, 1016] as the reference does.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from rgbnomore_tpu.ops import blocks, geometry, photometric as ph

CHROMA_OPS = frozenset({"Grayscale", "Color", "AutoSaturation", "ChromaDrop"})


def _magnitude_table(num_bins: int, grid_h: int, grid_w: int) -> dict[str, tuple[np.ndarray, bool]]:
    """op -> (magnitudes[num_bins], signed).  ``custom_transforms.py:1066-1092``."""
    lin = lambda a, b: np.linspace(a, b, num_bins)
    zero = np.zeros(num_bins)
    return {
        "Identity": (zero, False),
        "AutoContrast": (zero, False),
        "Equalize": (zero, False),
        "Invert": (zero, False),
        "Rotate": (lin(0.0, 30.0), True),
        "Posterize": (np.round(lin(0.0, 5.0)), False),
        "Solarize": (lin(818, -818), False),
        "SolarizeAdd": (lin(0, 883), False),
        "Color": (lin(0.0, 0.9), True),
        "Contrast": (lin(0.0, 0.9), True),
        "Brightness": (lin(0.0, 0.9), True),
        "Sharpness": (lin(0.0, 0.9), True),
        "ShearX": (lin(0.0, 17.0), True),
        "ShearY": (lin(0.0, 17.0), True),
        "Cutout": (lin(0, 6), False),
        "TranslateX": (lin(0.0, 150.0 / 336.0 * grid_w), True),
        "TranslateY": (lin(0.0, 150.0 / 336.0 * grid_h), True),
        "Rotate90": (np.ones(num_bins), True),
        "AutoSaturation": (zero, False),
        "Grayscale": (zero, False),
        "MidfreqAug": (lin(0.0, 0.9), True),
        "FreqEnhance": (lin(0.0, 0.9), True),
        "ChromaDrop": (zero, False),
    }


def _clamp_pair(y, c):
    return ph.clamp_dct(y), ph.clamp_dct(c)


def _make_op(name: str, mag: float, signed: bool, pad: float) -> Callable:
    """Single-sample op ``(y, c, draws) -> (y, c)``.

    ``y``: (1, H, W, 8, 8), ``c``: (2, H/2, W/2, 8, 8), float32.  ``draws``
    carries the pre-drawn per-round randomness ``(sign, cut_ch, cut_cw,
    drop_cb)`` (see :meth:`RandAugmentDCT.draw_policy`) so op bodies are
    RNG-free — the same branches run under the XLA ``lax.switch`` path and
    inside the fused Pallas pipeline kernel.  Semantics follow
    ``_apply_op_dct`` (``custom_transforms.py:944-1021``).
    """

    def op(y, c, draws):
        sign, cut_ch, cut_cw, drop_cb = draws
        m = mag * sign if signed else mag
        if name == "Identity":
            return y, c
        if name == "ShearX":
            if mag == 0.0:
                return y, c
            f = lambda s: ( geometry.shear_block(y, deg_x=s, pad=pad),
                            geometry.shear_block(c, deg_x=s, pad=pad))
            y2, c2 = jax.lax.cond(sign > 0, lambda: f(mag), lambda: f(-mag))
            return _clamp_pair(y2, c2)
        if name == "ShearY":
            if mag == 0.0:
                return y, c
            f = lambda s: ( geometry.shear_block(y, deg_y=s, pad=pad),
                            geometry.shear_block(c, deg_y=s, pad=pad))
            y2, c2 = jax.lax.cond(sign > 0, lambda: f(mag), lambda: f(-mag))
            return _clamp_pair(y2, c2)
        if name == "Rotate":
            if mag == 0.0:
                return y, c
            f = lambda s: ( geometry.rotate_block(y, degrees=s, pad=pad),
                            geometry.rotate_block(c, degrees=s, pad=pad))
            y2, c2 = jax.lax.cond(sign > 0, lambda: f(mag), lambda: f(-mag))
            return _clamp_pair(y2, c2)
        if name in ("TranslateX", "TranslateY"):
            direction = "W" if name == "TranslateX" else "H"
            # the reference applies the sign BEFORE evenizing with float
            # modulo (custom_transforms.py:958), so +3.75 -> +2 blocks but
            # -3.75 -> -4 blocks; both static-shift branches replicate that
            t_pos = int(mag - (mag % 2))
            t_neg = int(-mag - ((-mag) % 2))
            if t_pos == 0 and t_neg == 0:
                return y, c
            f = lambda s: (ph.translate_dct(y, s, direction),
                           ph.translate_dct(c, s // 2, direction))
            y2, c2 = jax.lax.cond(sign > 0, lambda: f(t_pos), lambda: f(t_neg))
            return _clamp_pair(y2, c2)
        if name == "Brightness":
            return _clamp_pair(ph.brightness_dct(y, 1.0 + m), c)
        if name == "Color":
            return _clamp_pair(y, ph.contrast_dct(c, 1.0 + m))
        if name == "Contrast":
            return _clamp_pair(ph.contrast_dct(y, 1.0 + m), c)
        if name == "Sharpness":
            return _clamp_pair(ph.sharpblur_dct(y, m), c)
        if name == "Posterize":
            return _clamp_pair(ph.posterize_dct(y, mag), ph.posterize_dct(c, mag))
        if name == "Solarize":
            y2, mask = ph.solarize_dct(y, mag)
            cmask = jnp.repeat(mask[:, ::2, ::2], 2, axis=0)
            c2, _ = ph.solarize_dct(c, mag, cmask)
            return _clamp_pair(y2, c2)
        if name == "AutoContrast":
            return _clamp_pair(ph.autocontrast_dct(y), c)
        if name == "Equalize":
            return _clamp_pair(ph.equalize_dct(y), c)
        if name == "Invert":
            return _clamp_pair(ph.invert_dct(y), ph.invert_dct(c))
        if name == "Cutout":
            size = int(round(mag))
            size -= size % 2
            y2 = ph.cutout_dct(y, size, cut_ch, cut_cw)
            c2 = ph.cutout_dct(c, size // 2, cut_ch // 2, cut_cw // 2)
            return _clamp_pair(y2, c2)
        if name == "SolarizeAdd":
            y2, _ = ph.solarize_add_dct(y, int(mag), threshold=0.0)
            return _clamp_pair(y2, c)
        if name == "Rotate90":
            f = lambda k: (blocks.rotate_dct_90deg(y, k), blocks.rotate_dct_90deg(c, k))
            y2, c2 = jax.lax.cond(sign > 0, lambda: f(1), lambda: f(3))
            return _clamp_pair(y2, c2)
        if name == "AutoSaturation":
            return _clamp_pair(y, ph.autocontrast_dct(c))
        if name == "Grayscale":
            return _clamp_pair(y, c * 0.0)
        if name == "MidfreqAug":
            return _clamp_pair(ph.midfreqaug_dct(y, m), c)
        if name == "FreqEnhance":
            return _clamp_pair(ph.freq_enhance_dct(y, 1.0 + m), ph.freq_enhance_dct(c, 1.0 + m))
        if name == "ChromaDrop":
            keep = jnp.where(
                drop_cb, jnp.asarray([0.0, 1.0]), jnp.asarray([1.0, 0.0])
            ).reshape(2, 1, 1, 1, 1)
            return _clamp_pair(y, c * keep)
        raise ValueError(f"Unknown DCT augmentation op: {name}")

    return op


@dataclasses.dataclass
class RandAugmentDCT:
    """Batched DCT RandAugment policy.

    Args mirror the reference (``custom_transforms.py:1045-1064``):
    ``num_ops`` rounds per sample, a fixed ``magnitude`` index into the
    11-bin table, an op list, and sqrt(2) grid padding for rotate/shear.
    """

    ops_list: list[str]
    num_ops: int = 2
    magnitude: int = 3
    num_magnitude_bins: int = 11
    grid: int = 28
    pad: float = 2**0.5

    def __post_init__(self):
        table = _magnitude_table(self.num_magnitude_bins, self.grid, self.grid)
        unknown = [o for o in self.ops_list if o not in table]
        if unknown:
            raise ValueError(f"Unknown ops: {unknown}")
        self._ops = []
        for name in self.ops_list:
            mags, signed = table[name]
            self._ops.append(_make_op(name, float(mags[self.magnitude]), signed, self.pad))
        n = len(self.ops_list)
        self._signed = jnp.asarray(
            [table[o][1] for o in self.ops_list], jnp.float32
        )
        self._is_chroma = np.asarray([o in CHROMA_OPS for o in self.ops_list])
        self._is_gray = np.asarray([o == "Grayscale" for o in self.ops_list])

    def _per_sample_policy(self, rng: jax.Array, h: int, w: int):
        """Draw one sample's rounds: ``(idx, sign, cut_ch, cut_cw, drop_cb)``,
        each ``(num_ops,)``.  Key consumption is identical to the pre-refactor
        in-branch draws (same splits, same calls — under the batched switch
        every branch consumed the same ``k_inner``), so seeded outputs are
        unchanged.  The grayscale/chroma exclusion rule lives here."""
        n = len(self.ops_list)
        signed = self._signed
        is_chroma = jnp.asarray(self._is_chroma)
        is_gray = jnp.asarray(self._is_gray)

        def round_body(carry, _):
            allowed, rng = carry
            rng, k_op, k_sign, k_inner = jax.random.split(rng, 4)
            # if exclusions emptied the list (all-chroma lists), reopen it
            allowed = jnp.where(allowed.any(), allowed, jnp.ones_like(allowed))
            logits = jnp.where(allowed, 0.0, -jnp.inf)
            idx = jax.random.categorical(k_op, logits)
            sign = jnp.where(
                jax.random.bernoulli(k_sign) & (signed[idx] > 0), -1.0, 1.0
            )
            kh, kw = jax.random.split(k_inner)
            cut_ch = jax.random.randint(kh, (), 0, h) // 2 * 2
            cut_cw = jax.random.randint(kw, (), 0, w) // 2 * 2
            drop_cb = jax.random.bernoulli(k_inner)
            # exclusion rule: grayscale disables chroma ops and vice versa
            chose_gray = is_gray[idx]
            chose_chroma = is_chroma[idx] & ~chose_gray
            allowed = jnp.where(chose_gray, allowed & ~is_chroma, allowed)
            allowed = jnp.where(chose_chroma, allowed & ~is_gray, allowed)
            return (allowed, rng), (idx, sign, cut_ch, cut_cw, drop_cb)

        allowed = jnp.ones((n,), bool)
        _, outs = jax.lax.scan(round_body, (allowed, rng), None, length=self.num_ops)
        return outs

    def draw_policy(self, rng: jax.Array, batch: int, h: int, w: int):
        """Batch policy draws: ``(idx, sign, cut_ch, cut_cw, drop_cb)``, each
        ``(batch, num_ops)``.  Shared by the XLA switch path and the fused
        Pallas pipeline kernel so both apply bit-identical decisions."""
        keys = jax.random.split(rng, batch)
        return jax.vmap(lambda k: self._per_sample_policy(k, h, w))(keys)

    def __call__(self, rng: jax.Array, y: jax.Array, cbcr: jax.Array):
        """Apply to a batch: y (B, 1, H, W, 8, 8), cbcr (B, 2, H/2, W/2, 8, 8)."""
        if not self.ops_list:
            return y, cbcr
        ops = self._ops
        policy = self.draw_policy(rng, y.shape[0], y.shape[2], y.shape[3])

        def per_sample(y1, c1, idx, sign, cut_ch, cut_cw, drop_cb):
            y1 = ph.clamp_dct(y1)
            c1 = ph.clamp_dct(c1)

            # scan over rounds so the op branches are traced/compiled once
            def round_body(carry, xs):
                y1, c1 = carry
                y1, c1 = jax.lax.switch(xs[0], ops, y1, c1, xs[1:])
                return (y1, c1), None

            (y1, c1), _ = jax.lax.scan(
                round_body, (y1, c1), (idx, sign, cut_ch, cut_cw, drop_cb)
            )
            return y1, c1

        return jax.vmap(per_sample)(y, cbcr, *policy)
