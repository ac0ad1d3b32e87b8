"""Linear (pixel-shuffle) prediction heads (reference
src/models/heads/linear_head.py:12-73): each decoder token predicts its
16x16 patch of outputs through one Dense layer; depth-to-space rearrange
recovers the pixel map. Not wired into the flagship SIU3RModel (the
reference keeps them as alternatives to the DPT heads) but provided for
head_factory parity."""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """torch F.pixel_shuffle on NHWC: [B, H, W, C*r*r] -> [B, H*r, W*r, C]
    (torch channel ordering: c_out index = c, then ry, then rx)."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, ry, w, rx, c
    return x.reshape(b, h * r, w * r, c)


class LinearPts3d(nn.Module):
    """Token -> patch_size^2 x (3 [+conf]) point map."""

    patch_size: int = 16
    has_conf: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, decoder_tokens: List[jax.Array], image_size: Tuple[int, int]):
        h, w = image_size
        tokens = decoder_tokens[-1]  # [B, S, D]
        out_ch = (3 + int(self.has_conf)) * self.patch_size**2
        feat = nn.Dense(out_ch, dtype=self.dtype, name="proj")(tokens)
        b = tokens.shape[0]
        nh, nw = h // self.patch_size, w // self.patch_size
        feat = feat.reshape(b, nh, nw, out_ch)
        # torch path views as [B, C*r*r, nh, nw] then pixel-shuffles; our
        # Dense output is channel-last so reorder to (c, ry, rx) blocks
        return pixel_shuffle(feat, self.patch_size)  # [B, H, W, 3(+conf)]


class LinearGS(nn.Module):
    """Token -> patch_size^2 x raw-gaussian-parameter map
    (reference linear_head.py:44-73)."""

    patch_size: int = 16
    d_out: int = 83
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, decoder_tokens: List[jax.Array], image_size: Tuple[int, int]):
        h, w = image_size
        tokens = decoder_tokens[-1]
        out_ch = self.d_out * self.patch_size**2
        feat = nn.Dense(out_ch, dtype=self.dtype, name="proj")(tokens)
        b = tokens.shape[0]
        nh, nw = h // self.patch_size, w // self.patch_size
        return pixel_shuffle(feat.reshape(b, nh, nw, out_ch), self.patch_size)
