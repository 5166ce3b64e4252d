"""OCR predictor: the ParseqPredictor equivalent.

Parity: sgm/modules/predictors/model.py —
  - preprocessing: resize crops to 32×128 bicubic, Normalize(0.5, 0.5) (:14-17)
  - img2txt: greedy decode via the tokenizer (:33-37)
  - calc_loss: per-sample CE over the character positions up to EOS, clamped
    at 1.0 (:40-57)

TPU redesign: the reference crops ragged r_bbox regions host-side; here the
jit path uses per-sample `jax.image.scale_and_translate` (a traced affine
resample) so the OCR loss stays inside the compiled training step.
"""

from __future__ import annotations

import dataclasses
import functools
import inspect
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .models.parseq import PARSeq, ParseqTokenizer

Array = jax.Array


@functools.lru_cache(maxsize=None)
def _accepts_refine_iters(model_cls) -> bool:
    return "refine_iters" in inspect.signature(model_cls.__call__).parameters


def crop_resize_bbox(
    image: Array, r_bbox: Array, out_hw=(32, 128), method: str = "cubic"
) -> Array:
    """Resample the bbox region of one image (H, W, C) to out_hw.

    r_bbox = (top, bottom, left, right); sizes may be traced values — the
    affine scale/translate keeps shapes static.
    """
    top, bottom, left, right = [r_bbox[i].astype(jnp.float32) for i in range(4)]
    oh, ow = out_hw
    scale_y = oh / jnp.maximum(bottom - top, 1.0)
    scale_x = ow / jnp.maximum(right - left, 1.0)
    scale = jnp.stack([scale_y, scale_x])
    translation = jnp.stack([-top * scale_y, -left * scale_x])
    return jax.image.scale_and_translate(
        image.astype(jnp.float32),
        (oh, ow, image.shape[-1]),
        (0, 1),
        scale,
        translation,
        method=method,
    )


@dataclasses.dataclass(frozen=True)
class ParseqPredictor:
    """Frozen PARSeq with tokenizer; params passed explicitly."""

    model: PARSeq = PARSeq()
    tokenizer: ParseqTokenizer = dataclasses.field(default_factory=ParseqTokenizer)

    @property
    def img_hw(self):
        return tuple(self.model.img_size)

    def preprocess(self, crops: Array) -> Array:
        """crops (B, H, W, 3) in [0, 1] → normalized (x - .5)/.5."""
        return (crops - 0.5) / 0.5

    def read_logits(self, params, crops: Array, refine_iters: int = 1) -> Array:
        x = self.preprocess(crops)
        # CTC-style hub models (CRNN) take no refine arg; detect by signature
        # rather than catching TypeError, which would mask genuine errors from
        # inside the forward pass
        if _accepts_refine_iters(type(self.model)):
            return self.model.apply(params, x, refine_iters)
        return self.model.apply(params, x)

    def img2txt(self, params, crops: Array) -> List[str]:
        """crops already resized to (B, 32, 128, 3), [0, 1] range."""
        logits = self.read_logits(params, crops)
        ids = np.asarray(jnp.argmax(logits, axis=-1))
        return self.tokenizer.decode_ids(ids)

    def img2txt_ragged(self, params, images: Sequence[np.ndarray]) -> List[str]:
        """Host path for ragged crops (reference img2txt): bicubic resize each
        crop to 32×128 then batch."""
        import cv2

        h, w = self.img_hw
        crops = np.stack(
            [
                cv2.resize(np.asarray(im, np.float32), (w, h), interpolation=cv2.INTER_CUBIC)
                for im in images
            ]
        )
        return self.img2txt(params, jnp.asarray(np.clip(crops, 0.0, 1.0)))

    def calc_loss(
        self,
        params,
        images: Array,
        r_bbox: Array,
        label_ids: Array,
        refine_iters: int = 1,
    ) -> Array:
        """Per-sample clamped CE (reference calc_loss :40-57), jit-friendly.

        images (B, H, W, 3); r_bbox (B, 4); label_ids (B, L) from
        `tokenizer.encode` ([BOS, chars, EOS, PAD...]).

        Reference semantics: the predictor's FULL forward (`self(x)` —
        AR greedy decode + cloze refinement, model.py:26-31,42) produces the
        logits; CE is taken at positions [0, n_chars) against the GT chars
        (gt_id[1:eos] vs pred[:eos-1], :48-53), averaged per sample and
        clamped at 1.0. Gradients flow to the image through the frozen
        recognizer's encode/decode; the greedy ids are non-differentiable
        constants on both sides.
        """
        # parity: the reference feeds the raw decoded output (no clamp) to the
        # predictor transform during training (loss.py:178-190)
        crops = jax.vmap(lambda im, bb: crop_resize_bbox(im, bb, self.img_hw))(images, r_bbox)
        logits = self.read_logits(params, crops, refine_iters)  # (B, S, C)

        tgt = label_ids[:, 1:]  # drop BOS → [chars..., EOS, PAD...]
        n = min(tgt.shape[1], logits.shape[1])
        tgt, logits = tgt[:, :n], logits[:, :n]
        # positions strictly before the first EOS are the scored chars
        is_char = jnp.cumsum((tgt == self.tokenizer.eos_id).astype(jnp.int32), axis=-1) == 0
        logp = jax.nn.log_softmax(logits, axis=-1)
        tgt_idx = jnp.clip(tgt, 0, logits.shape[-1] - 1)
        nll = -jnp.take_along_axis(logp, tgt_idx[..., None], axis=-1)[..., 0]
        per_sample = jnp.sum(nll * is_char, axis=-1) / jnp.maximum(
            jnp.sum(is_char, axis=-1), 1
        )
        return jnp.clip(per_sample, a_max=1.0)
