"""Full RGRG pipeline: detector -> region selection -> per-region decoding.

TPU-native redesign of the reference ReportGenerationModel
(report_generation_model.py):

  - The reference's dynamic `selected_region_features [N_sel, 1024]` gather
    becomes a device-side compaction to a STATIC decode budget: selected
    (image, region) pairs are argsort-compacted to the front (original order
    preserved, matching the reference's boolean-mask flattening), padded to
    `r_budget`, decoded as one batch, and scattered back to [B, 29, L].
  - The `-1` "nothing selected" sentinel (report_generation_model.py:122-135)
    becomes an all-False `selected_regions` mask; padding rows are born
    finished in the decode loop, so an empty selection costs ~nothing.
  - The host picks `r_budget` from the actual selection count (one scalar
    readback) and dispatches to a per-bucket jitted decode — the TPU replaces
    dynamic shapes with a handful of compiled buckets.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rgrg_tpu.core import constants as C
from rgrg_tpu.core.config import ModelConfig
from rgrg_tpu.decode.greedy import greedy_generate
from rgrg_tpu.models import gpt2
from rgrg_tpu.models.detector import RegionDetector


def ladder_budget(n: int) -> int:
    """Smallest {2^k, 3*2^k}-ladder value >= n (8, 12, 16, 24, 32, 48, ...).

    The shared static-size ladder: decode row budgets (budget_for) and the
    bench's self-certified post-NMS proposal budget (bench certify_budget)
    pick from this sequence so the set of compiled graph shapes stays
    small while padding waste is <=33%. (scripts/validate_proposal_budget
    certifies whatever explicit --budgets list it is given — the round-2
    artifact validated 600/300/150, not ladder values; the certification
    RULE budget >= survivors_max is what transfers.)
    """
    budget = 8
    while budget < n:
        budget = (budget * 3 // 2 if (budget & (budget - 1)) == 0
                  else budget * 4 // 3)
    return budget


@dataclasses.dataclass(frozen=True)
class RGRG:
    """The full model: a RegionDetector flax module + functional decoder.

    Params layout: {"detector": {"params":..., "batch_stats":...},
                    "decoder": <gpt2 params>}.
    """

    cfg: ModelConfig = ModelConfig()

    @property
    def detector(self) -> RegionDetector:
        return RegionDetector(cfg=self.cfg.detector)

    def init(self, rng: jax.Array, decoder_dtype=jnp.float32) -> Dict[str, Any]:
        r1, r2 = jax.random.split(rng)
        det_vars = self.detector.init(
            r1, jnp.zeros((1, self.cfg.detector.image_size,
                           self.cfg.detector.image_size, 1)), train=False)
        dec = gpt2.init_decoder_params(r2, self.cfg.decoder, decoder_dtype)
        return {"detector": dict(det_vars), "decoder": dec}

    # ---------------- jitted stages ----------------

    def _prepare_images(self, images: jnp.ndarray,
                        resize_mats) -> jnp.ndarray:
        """Raw-uint8 [B, H, W] + per-shape resize matrices -> normalized
        NHWC in the detector's compute dtype (ops/resize.py); already-
        preprocessed inputs pass through (with the serving bf16-upload
        cast when the detector computes in f32)."""
        if resize_mats is not None:
            from rgrg_tpu.ops.resize import device_preprocess
            wy, wx = resize_mats
            out_dtype = (jnp.bfloat16
                         if self.cfg.detector.dtype == "bfloat16"
                         else jnp.float32)
            return device_preprocess(images, wy, wx, out_dtype=out_dtype)
        if (images.dtype == jnp.bfloat16
                and self.cfg.detector.dtype == "float32"):
            images = images.astype(jnp.float32)
        return images

    @functools.partial(jax.jit, static_argnames=("self", "image_chunk"))
    def detect(self, params: Dict[str, Any], images: jnp.ndarray,
               resize_mats=None,
               image_chunk: Optional[int] = None) -> Dict[str, jnp.ndarray]:
        """images: [B, H, W, 1] normalized NHWC — or raw [B, H, W] uint8
        when `resize_mats` (wy, wx) is given, in which case resize + pad +
        normalize run on device as part of this graph (the host's only
        per-batch work is a uint8 np.stack; see ops/resize.py).

        image_chunk: run the detector over sub-batches of this size via
        lax.map (sequential, buffers reused across iterations) so peak
        detector HBM is bounded by one chunk's activations. This unlocks
        batch sizes whose DECODE bucket amortizes well but whose detector
        activations OOM when materialized at full batch (B=128 with
        chunk 32 on v5e; unchunked B=128 OOMs). Applied only when it
        divides the batch evenly; numerics are identical (per-image math).
        """
        images = self._prepare_images(images, resize_mats)

        def _fwd(im):
            return self.detector.apply(
                params["detector"], im, train=False,
                logit_threshold=self.cfg.classifier.logit_threshold)

        b = images.shape[0]
        if image_chunk and image_chunk < b and b % image_chunk == 0:
            stacked = images.reshape((b // image_chunk, image_chunk)
                                     + images.shape[1:])
            out = jax.lax.map(_fwd, stacked)
            return jax.tree.map(lambda x: x.reshape((b,) + x.shape[2:]), out)
        return _fwd(images)

    @functools.partial(jax.jit, static_argnames=(
        "self", "r_budget", "max_length", "precision", "num_beams",
        "early_stopping", "kv_cache_dtype", "do_sample", "temperature",
        "top_k", "top_p", "mesh", "return_done"))
    def decode_selected(self, params: Dict[str, Any],
                        region_features: jnp.ndarray,
                        selected_regions: jnp.ndarray,
                        r_budget: int, max_length: int,
                        precision=None, num_beams: int = 1,
                        early_stopping: bool = False,
                        kv_cache_dtype=None,
                        do_sample: bool = False, temperature: float = 1.0,
                        top_k: int = 0, top_p: float = 1.0,
                        sample_rng: Optional[jax.Array] = None,
                        mesh=None, return_done: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Compact selected regions to r_budget rows, decode (greedy or
        beam), scatter back.

        region_features: [B, 29, 1024]; selected_regions: [B, 29] bool.
        Returns (output_ids [B, 29, max_length], decoded_mask [B, 29]):
        decoded_mask marks regions whose row fit in the budget.
        return_done (beam only): additionally return a [B, 29] bool mask of
        rows whose beam search CLOSED before max_length (see
        beam_generate) — the cascade's bucket-final criterion.

        mesh: optional jax.sharding.Mesh (static). The compaction gather
        mixes rows across the batch, so GSPMD's default resolution would
        REPLICATE the compacted decode batch on every device of a
        data-parallel serving mesh; constraining the compacted rows to the
        mesh's leading axis keeps the decode loop itself sharded (requires
        r_budget % mesh.size == 0 — DP serving rounds the budget up).
        """
        if return_done and (num_beams <= 1 or do_sample):
            raise ValueError("return_done is a beam-search signal "
                             "(num_beams > 1, no sampling)")
        b = region_features.shape[0]
        flat_feats = region_features.reshape(b * C.NUM_REGIONS, -1)
        sel = selected_regions.reshape(-1)

        order = jnp.argsort(jnp.where(sel, 0, 1), stable=True)
        idx = order[:r_budget]
        active = sel[idx]
        feats = flat_feats[idx]
        if mesh is not None and r_budget % mesh.size == 0:
            from jax.sharding import NamedSharding, PartitionSpec
            row_shard = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
            feats = jax.lax.with_sharding_constraint(feats, row_shard)
            active = jax.lax.with_sharding_constraint(active, row_shard)

        if do_sample:
            from rgrg_tpu.decode.sample import sample_generate
            rng = sample_rng if sample_rng is not None else jax.random.PRNGKey(0)
            ids = sample_generate(params["decoder"], feats, rng,
                                  self.cfg.decoder, max_length=max_length,
                                  temperature=temperature, top_k=top_k,
                                  top_p=top_p, precision=precision,
                                  active=active)
        elif num_beams > 1:
            from rgrg_tpu.decode.beam import beam_generate
            ids = beam_generate(params["decoder"], feats, self.cfg.decoder,
                                max_length=max_length, num_beams=num_beams,
                                length_penalty=self.cfg.generation.length_penalty,
                                early_stopping=early_stopping,
                                precision=precision, active=active,
                                cache_dtype=kv_cache_dtype,
                                return_done=return_done)
            if return_done:
                ids, row_done = ids
        else:
            ids = greedy_generate(params["decoder"], feats, self.cfg.decoder,
                                  max_length=max_length, precision=precision,
                                  active=active,
                                  cache_dtype=kv_cache_dtype)  # [r_budget, L]

        out = jnp.full((b * C.NUM_REGIONS, max_length),
                       self.cfg.decoder.pad_token_id, jnp.int32)
        out = out.at[idx].set(jnp.where(active[:, None], ids,
                                        self.cfg.decoder.pad_token_id))
        decoded = jnp.zeros((b * C.NUM_REGIONS,), bool).at[idx].set(active)
        if return_done:
            done = jnp.zeros((b * C.NUM_REGIONS,), bool).at[idx].set(
                row_done & active)
            return (out.reshape(b, C.NUM_REGIONS, max_length),
                    decoded.reshape(b, C.NUM_REGIONS),
                    done.reshape(b, C.NUM_REGIONS))
        return (out.reshape(b, C.NUM_REGIONS, max_length),
                decoded.reshape(b, C.NUM_REGIONS))

    @functools.partial(jax.jit, static_argnames=(
        "self", "r_budget", "max_length", "precision", "num_beams",
        "early_stopping", "kv_cache_dtype", "image_chunk", "mesh",
        "return_features", "return_done"))
    def detect_and_decode(self, params: Dict[str, Any], images: jnp.ndarray,
                          selected_regions: jnp.ndarray, r_budget: int,
                          max_length: int, precision=None, num_beams: int = 1,
                          early_stopping: bool = False, kv_cache_dtype=None,
                          resize_mats=None,
                          image_chunk: Optional[int] = None,
                          mesh=None,
                          return_features: bool = False,
                          return_done: bool = False
                          ) -> Dict[str, jnp.ndarray]:
        """One-dispatch serving step: detector + budgeted decode as a SINGLE
        jitted graph. On a tunneled TPU every dispatch costs a host-device
        roundtrip serialized with compute (~27 ms here); the serving
        pipeline's caller-selected path (selection_override) needs no
        classifier readback between the stages, so it fuses them.

        selected_regions=None decodes the detector's OWN classifier
        selection (the classifier-driven product flow) in the same fused
        graph — usable whenever the caller knows a static r_budget without
        reading the selection count back first, i.e. serving's speculative
        budget prediction: the readback then becomes a validation-only
        fetch off the dispatch critical path (serving.py). Rows beyond
        r_budget are left undecoded exactly as in decode_selected; the
        caller must check the actual count and re-decode on a budget miss.

        Images may be bf16 (the serving upload dtype when the detector
        computes in bf16) or f32 — or raw [B, H, W] uint8 with
        `resize_mats` (preprocessing joins the fused graph).
        """
        det = self.detect(params, images, resize_mats,
                          image_chunk=image_chunk)  # nested jit inlines
        sel = (det["selected_regions"] if selected_regions is None
               else selected_regions)
        res = self.decode_selected(
            params, det["region_features"], sel, r_budget,
            max_length, precision=precision, num_beams=num_beams,
            early_stopping=early_stopping, kv_cache_dtype=kv_cache_dtype,
            mesh=mesh, return_done=return_done)
        ids, decoded = res[0], res[1]
        out = {
            "output_ids": ids,
            "decoded_mask": decoded,
            "selected_regions": sel,
            "class_detected": det["class_detected"],
            "top_region_boxes": det["top_region_boxes"],
            "selection_logits": det["selection_logits"],
        }
        if return_done:
            out["decode_done"] = res[2]
        if return_features:
            # serving's length-bucket cascade continues decoding unfinished
            # rows outside this fused graph; keep this off the default path
            # so the per-batch device_get doesn't carry [B,29,1024] floats
            out["region_features"] = det["region_features"]
        return out

    # ---------------- host orchestration ----------------

    def decode_selected_cascade(self, params: Dict[str, Any],
                                region_features: jnp.ndarray,
                                selected_regions,
                                max_length: int, precision=None,
                                kv_cache_dtype=None, mesh=None,
                                buckets: Optional[Tuple[int, ...]] = None,
                                first_count: Optional[int] = None,
                                num_beams: int = 1,
                                early_stopping: bool = False,
                                stats=None, stats_rung1: bool = True
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Decode (greedy or beam) through the static length-bucket ladder.

        Decode everything at a short cache first (~95% of region sentences
        are <60 tokens, run_configurations.py:50-51), then re-decode only
        the rows that hit the cap at the next bucket — each decode step
        attends over the FULL static cache buffer, so a 300-slot cache
        costs ~5x the HBM traffic of a 64-slot one even for short
        sentences. Costs one host sync per bucket actually used.

        Bucket-equivalence arguments, per mode:
          * greedy: prefix-deterministic — a row finishing (EOS) inside the
            bucket is byte-identical to the full-length decode; rows whose
            last slot holds a real token are re-decoded.
          * beam: a row is bucket-final iff its search CLOSED (`done` from
            beam_generate — BeamHypotheses.is_done depends on cur_len only,
            never max_length) AND its best hypothesis + appended EOS fit
            inside the bucket (pad in the last slot). Closed rows stop
            updating the finished pool and contribute no alive beams, so
            finalize reads the same pool under any longer cap; all other
            rows (open searches, whose alive beams could still beat the
            pool, or boundary EOS-clip cases) are re-decoded from scratch
            at the next rung — which is exactly the longer-cap trajectory,
            since beam steps are cap-independent. Equality with the
            single full-length decode is pinned in
            tests/test_length_buckets.py for both early_stopping modes.

        buckets: override the config ladder (serving's fused branch decodes
        its first bucket inside detect_and_decode and continues here).
        first_count: the selection count for the FIRST bucket when the
        caller already read it back (saves one ~27 ms tunnel sync).
        stats: optional serving.CascadeStats — records rows entering each
        rung (the per-rung counts ARE host-synced here anyway to pick the
        bucket, so telemetry costs nothing extra). The cascade's measured
        WORST case is 1.37x slower than a single full-length decode
        (docs/artifacts/beam_eval_cascade.json: nothing closes at rung 1);
        callers serving many batches use the stats to bail out of the
        ladder when observed closure is low (serving.py).
        Returns (output_ids [B, 29, max_length], decoded_mask [B, 29]).
        """
        b = region_features.shape[0]
        pad_id = self.cfg.decoder.pad_token_id
        if buckets is None:
            buckets = self.cfg.generation.length_buckets
        if not buckets or buckets[-1] < max_length:
            # the ladder must reach max_length: without this final rung a
            # max_length beyond the last config bucket would silently return
            # truncated prefixes for rows still unfinished at buckets[-1]
            buckets = tuple(buckets) + (max_length,)

        output_ids, decoded_mask = None, None
        remaining = jnp.asarray(selected_regions)
        n_first = None
        for j, bucket in enumerate(buckets):
            bucket = min(bucket, max_length)
            if j == 0 and first_count is not None:
                n_rem = first_count
            else:
                n_rem = int(jnp.sum(remaining))  # host sync: picks the bucket
            if j == 0:
                n_first = n_rem
            elif j == 1 and stats is not None and stats_rung1:
                # rung-1 closure drives the serving bail-out;
                # stats_rung1=False when the caller ran rung 1 itself
                # (serving's fused branch) and recorded this already
                stats.record_rung1(n_first, n_rem)
            if stats is not None:
                stats.record_rung(bucket, n_rem)
            if output_ids is not None and n_rem == 0:
                break
            res = self.decode_selected(
                params, region_features, remaining,
                self.budget_for(n_rem, b, mesh=mesh), bucket,
                precision=precision, kv_cache_dtype=kv_cache_dtype,
                mesh=mesh, num_beams=num_beams,
                early_stopping=early_stopping,
                return_done=num_beams > 1 and bucket < max_length)
            ids_b, dec_b = res[0], res[1]
            ids_b = jnp.pad(ids_b, ((0, 0), (0, 0), (0, max_length - bucket)),
                            constant_values=pad_id)
            if output_ids is None:
                output_ids, decoded_mask = ids_b, dec_b
            else:
                take = remaining[..., None]
                output_ids = jnp.where(take, ids_b, output_ids)
                decoded_mask = decoded_mask | dec_b
            if bucket >= max_length:
                break
            # rows that filled the bucket without finishing (pad == eos,
            # so an unfinished row's last slot is a real token); for beam,
            # a row is only final when its search also CLOSED (see
            # docstring) — open rows re-decode even if their current best
            # hypothesis is short
            unfinished = ids_b[:, :, bucket - 1] != pad_id
            if num_beams > 1:
                unfinished = unfinished | ~res[2]
            remaining = remaining & dec_b & unfinished
        return output_ids, decoded_mask

    def budget_for(self, num_selected: int, batch: int, mesh=None) -> int:
        """Pick a static decode bucket >= num_selected from the
        {2^k, 3*2^k} ladder (8, 12, 16, 24, 32, 48, ...), capped at B*29.
        The 3*2^k steps cap padding waste at ~33% while keeping the set of
        compiled decode graphs small. With a mesh, the budget is rounded up
        to a multiple of mesh.size (decode_selected shards the compacted
        row axis for DP; the cap B*29 is already divisible because serving
        enforces B % mesh.size == 0)."""
        cap = batch * C.NUM_REGIONS
        r = cap if num_selected >= cap else min(ladder_budget(num_selected),
                                                cap)
        if mesh is not None:
            m = mesh.size
            r = min((r + m - 1) // m * m, cap)
        return r

    def generate(self, params: Dict[str, Any], images: jnp.ndarray,
                 max_length: Optional[int] = None,
                 num_beams: int = 1, early_stopping: bool = False,
                 precision=None,
                 selection_override: Optional[jnp.ndarray] = None
                 ) -> Dict[str, Any]:
        """Full inference for a batch of images.

        Equivalent surface to reference ReportGenerationModel.generate
        (report_generation_model.py:212-276): returns output ids per selected
        region plus detections / masks for mapping sentences to regions.
        num_beams=1 is greedy; the reference product default is beam 4 with
        early stopping (generate_reports_for_images.py:109-114).

        selection_override: optional [B, 29] bool mask decoded INSTEAD of the
        classifier's selection (caller-specified regions — the batch form of
        the anatomy-based API; callers wanting detection gating intersect
        with class_detected themselves). Also the benchmarking hook for a
        deterministic region count per report.
        """
        if max_length is None:
            max_length = self.cfg.generation.max_length
        det = self.detect(params, images)
        sel = (det["selected_regions"] if selection_override is None
               else jnp.asarray(selection_override))
        num_selected = int(jnp.sum(sel))  # the one unavoidable readback:
        # forwarded as first_count so the cascade's first rung doesn't pay
        # a second host sync for the same value
        output_ids, decoded_mask = self.decode_selected_cascade(
            params, det["region_features"], sel, max_length,
            precision=precision, first_count=num_selected,
            num_beams=num_beams, early_stopping=early_stopping)
        return {
            "output_ids": output_ids,            # [B, 29, L]
            "selected_regions": np.asarray(sel),
            "decoded_mask": np.asarray(decoded_mask),
            "detections": {
                "top_region_boxes": np.asarray(det["top_region_boxes"]),
                "top_scores": np.asarray(det["top_scores"]),
            },
            "class_detected": np.asarray(det["class_detected"]),
        }
