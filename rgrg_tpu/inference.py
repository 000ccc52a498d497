"""Product inference API: images in, radiology reports out.

TPU-native equivalent of the reference's product entry point
(generate_reports_for_images.py) with two deliberate upgrades:
  - BATCHED: the reference loops one image at a time (`:194-197`); we batch
    images through the detector and all selected regions through one decode.
  - soft-dedup similarity is computed for all sentence pairs in one batched
    scorer call instead of one model invocation per pair.

Usage:
    gen = ReportGenerator.from_torch_checkpoint("ckpt.pt", tokenizer_dir=...)
    reports = gen.generate_reports(["a.jpg", "b.jpg"], num_beams=4,
                                   early_stopping=True)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from rgrg_tpu.core import constants as C
from rgrg_tpu.core.config import ModelConfig
from rgrg_tpu.data import transforms as T
from rgrg_tpu.models.full_model import RGRG
from rgrg_tpu.text.report import SimilarityFn, assemble_report
from rgrg_tpu.text.tokenizer import GPT2Tokenizer


@dataclasses.dataclass
class GeneratedReport:
    report: str
    region_sentences: Dict[str, str]          # region name -> sentence
    selected_regions: np.ndarray              # [29] bool
    class_detected: np.ndarray                # [29] bool
    top_region_boxes: np.ndarray              # [29, 4]


class ReportGenerator:
    def __init__(self, params, tokenizer: GPT2Tokenizer,
                 cfg: ModelConfig = ModelConfig(),
                 similarity_fn: Union[SimilarityFn, str, None] = "auto",
                 bertscore_threshold: float = 0.9):
        self.model = RGRG(cfg=cfg)
        self.params = params
        self.tokenizer = tokenizer
        if similarity_fn == "auto":
            # reference default: distilbert BERTScore soft dedup
            # (generate_reports_for_images.py:60-96); degrades to
            # exact-dedup-only when no local weights exist
            from rgrg_tpu.eval.bertscore import default_scorer
            similarity_fn = default_scorer()
        self.similarity_fn = similarity_fn
        self.threshold = bertscore_threshold

    # -------------------- constructors --------------------

    @classmethod
    def from_torch_checkpoint(cls, checkpoint_path: str, tokenizer_dir: str,
                              cfg: ModelConfig = ModelConfig(),
                              **kw) -> "ReportGenerator":
        from rgrg_tpu.core.checkpoint import (convert_full_checkpoint,
                                              load_torch_checkpoint)
        sd = load_torch_checkpoint(checkpoint_path)
        params = jax.tree.map(jnp.asarray, convert_full_checkpoint(
            sd, num_layers=cfg.decoder.num_layers))
        tok = GPT2Tokenizer.from_dir(tokenizer_dir)
        return cls(params, tok, cfg=cfg, **kw)

    @classmethod
    def from_orbax(cls, path: str, tokenizer_dir: str, **kw) -> "ReportGenerator":
        from rgrg_tpu.core.checkpoint import load_checkpoint
        params = load_checkpoint(path)
        tok = GPT2Tokenizer.from_dir(tokenizer_dir)
        return cls(params, tok, **kw)

    # -------------------- pipeline --------------------

    def preprocess(self, images: Sequence[Union[str, np.ndarray]],
                   transfer_dtype=None, sharding=None) -> jnp.ndarray:
        """Paths or grayscale arrays -> [B, 512, 512, 1] normalized batch.

        Uses the native C++ threaded pipeline (native/preprocess.cc) when
        built; falls back to the numpy/cv2 path. transfer_dtype: convert on
        the HOST before upload (serving passes bfloat16 when the detector
        computes in bf16 — numerically identical to uploading f32, half the
        host->device traffic, and no extra on-device cast dispatch).
        sharding: optional jax.sharding.Sharding for the uploaded batch
        (data-parallel serving shards the leading dim over a mesh)."""
        arrays = [T.load_image(im) if isinstance(im, str) else im
                  for im in images]
        from rgrg_tpu.data.native import preprocess_batch
        out = preprocess_batch(arrays)
        if transfer_dtype is not None:
            import ml_dtypes  # numpy-side bf16: upload the narrow dtype
            out = out.astype(ml_dtypes.bfloat16
                             if transfer_dtype == jnp.bfloat16
                             else transfer_dtype)
        if sharding is not None:
            return jax.device_put(out, sharding)
        return jnp.asarray(out)

    def _resize_mats(self, shape):
        """Per-input-shape (wy, wx) device-resize matrices, built once on
        the host (ops/resize.py) and kept on device across batches."""
        cache = getattr(self, "_resize_cache", None)
        if cache is None:
            cache = self._resize_cache = {}
        if shape not in cache:
            from rgrg_tpu.ops.resize import resize_matrices
            wy, wx = resize_matrices(shape[0], shape[1],
                                     self.model.cfg.detector.image_size)
            cache[shape] = (jnp.asarray(wy), jnp.asarray(wx))
        return cache[shape]

    def preprocess_raw(self, images: Sequence[Union[str, np.ndarray]],
                       sharding=None):
        """Device-resize fast path: paths or uint8 arrays ->
        ((raw [B, H, W] uint8 on device, (wy, wx)), None) when the whole
        batch shares one shape; (None, loaded arrays) otherwise — the
        caller falls back to the host pipeline WITH the already-decoded
        arrays (re-reading the files would double image I/O per
        mixed-shape batch on the 1-core host). Shrinks per-batch host work
        to a uint8 np.stack and moves resize+pad+normalize onto the MXU.
        sharding: optional batch sharding for data-parallel serving."""
        arrays = [T.load_image(im) if isinstance(im, str) else im
                  for im in images]
        shape = arrays[0].shape
        if any(a.shape != shape or a.dtype != np.uint8 or a.ndim != 2
               for a in arrays):
            return None, arrays
        stacked = np.stack(arrays)
        batch = (jax.device_put(stacked, sharding) if sharding is not None
                 else jnp.asarray(stacked))
        return (batch, self._resize_mats(shape)), None

    def generate_reports(self, images: Sequence[Union[str, np.ndarray]],
                         num_beams: Optional[int] = None,
                         max_length: Optional[int] = None,
                         early_stopping: bool = True,
                         ) -> List[GeneratedReport]:
        cfg = self.model.cfg
        if num_beams is None:
            num_beams = cfg.generation.num_beams
        if max_length is None:
            max_length = cfg.generation.max_length

        batch = self.preprocess(images)
        out = self.model.generate(self.params, batch, max_length=max_length,
                                  num_beams=num_beams,
                                  early_stopping=early_stopping)
        # one batched transfer: on a tunneled TPU every separate host fetch
        # costs a full roundtrip regardless of size (see serving._postprocess)
        out = jax.device_get(out)

        results = []
        ids = np.asarray(out["output_ids"])
        for b in range(len(images)):
            sel = out["decoded_mask"][b]
            region_sents: Dict[str, str] = {}
            ordered_sents: List[str] = []
            for r in range(C.NUM_REGIONS):
                if sel[r]:
                    text = self.tokenizer.decode(ids[b, r],
                                                 skip_special_tokens=True)
                    region_sents[C.REGION_NAMES[r]] = text
                    ordered_sents.append(text)
            report = assemble_report(ordered_sents, self.similarity_fn,
                                     self.threshold)
            results.append(GeneratedReport(
                report=report,
                region_sentences=region_sents,
                selected_regions=out["selected_regions"][b],
                class_detected=out["class_detected"][b],
                top_region_boxes=out["detections"]["top_region_boxes"][b]))
        return results

    # -------------------- interactive APIs --------------------

    def generate_for_regions(self, image: Union[str, np.ndarray],
                             region_names: Sequence[str],
                             num_beams: Optional[int] = None,
                             max_length: Optional[int] = None,
                             early_stopping: bool = True) -> Dict[str, str]:
        """Anatomy-based generation: sentences for the named regions only
        (the per-region decoding makes this free — paper's 'interactive
        capability' #1)."""
        batch = self.preprocess([image])
        det = self.model.detect(self.params, batch)
        mask = np.zeros((1, C.NUM_REGIONS), bool)
        for name in region_names:
            mask[0, C.ANATOMICAL_REGIONS[name]] = True
        mask &= np.asarray(det["class_detected"])
        cfg = self.model.cfg
        ids, decoded = self.model.decode_selected(
            self.params, det["region_features"], jnp.asarray(mask),
            self.model.budget_for(int(mask.sum()), 1),
            max_length or cfg.generation.max_length,
            num_beams=num_beams or cfg.generation.num_beams,
            early_stopping=early_stopping)
        ids = np.asarray(ids)
        return {name: self.tokenizer.decode(
                    ids[0, C.ANATOMICAL_REGIONS[name]], skip_special_tokens=True)
                for name in region_names
                if decoded[0, C.ANATOMICAL_REGIONS[name]]}

    def generate_for_boxes(self, image: Union[str, np.ndarray],
                           boxes: np.ndarray,
                           num_beams: Optional[int] = None,
                           max_length: Optional[int] = None,
                           early_stopping: bool = True) -> List[str]:
        """Selection-based generation: sentences for arbitrary user-drawn
        boxes (512-space pixel coords, [N, 4] xyxy). RoI-pools the given
        boxes directly, bypassing the RPN — the reference implements this in
        evaluate_bbox_variations.py:92-109 (get_bbox_features)."""
        cfg = self.model.cfg
        batch = self.preprocess([image])
        det_mod = self.model.detector
        variables = self.params["detector"]
        feats = det_mod.apply(variables, batch, method=det_mod.backbone_features)
        n = boxes.shape[0]
        region_feats = det_mod.apply(
            variables, feats, jnp.asarray(boxes[None].astype(np.float32)),
            method=det_mod.region_features_from_boxes)  # [1, N, 1024]

        from rgrg_tpu.decode.beam import beam_generate
        from rgrg_tpu.decode.greedy import greedy_generate
        nb = num_beams or cfg.generation.num_beams
        ml = max_length or cfg.generation.max_length
        flat = region_feats[0]
        if nb > 1:
            ids = beam_generate(self.params["decoder"], flat, cfg.decoder,
                                max_length=ml, num_beams=nb,
                                early_stopping=early_stopping)
        else:
            ids = greedy_generate(self.params["decoder"], flat, cfg.decoder,
                                  max_length=ml)
        return self.tokenizer.batch_decode(np.asarray(ids))


def write_generated_reports_to_txt(image_paths: Sequence[str],
                                   reports: Sequence[GeneratedReport],
                                   path: str) -> None:
    """Same artifact format as the reference
    (generate_reports_for_images.py:33-39)."""
    with open(path, "w") as f:
        for image_path, rep in zip(image_paths, reports):
            f.write(f"Image path: {image_path}\n")
            f.write(f"Generated report: {rep.report}\n\n")
            f.write("=" * 30)
            f.write("\n\n")
