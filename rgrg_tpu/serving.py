"""Pipelined batch serving: overlap host work with device compute.

The reference's product loop is strictly serial per image (preprocess ->
generate -> decode text, generate_reports_for_images.py:194-197). Here a
three-stage software pipeline keeps the TPU busy:

  stage P (thread): image load + native C++ preprocess of batch i+1
  stage D (main):   detector + budgeted decode of batch i on the device
  stage T (thread): tokenizer decode + report assembly of batch i-1

JAX dispatch is asynchronous, so stage D returns device arrays immediately;
the transfer/sync cost lands in stage T's np.asarray, off the critical path.
"""

from __future__ import annotations

import concurrent.futures as cf
import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence, Union

import numpy as np

from rgrg_tpu.inference import GeneratedReport, ReportGenerator
from rgrg_tpu.core import constants as C
from rgrg_tpu.text.report import assemble_report


@dataclasses.dataclass
class CascadeStats:
    """Closure telemetry + bail-out policy for the length-bucket cascade.

    The cascade's envelope speedup (2.42x, beam_eval_cascade.json) assumes
    the reference's length distribution: ~95% of region sentences fit the
    first bucket. Its measured WORST case — nothing closes at rung 1 — is
    1.37x SLOWER than decoding at max_length directly (the rung-1 decode
    is pure overhead). This object records the observed rung-1 closure
    rate across batches; when enough rows have been seen and closure is
    below `threshold`, `should_bail()` turns True and the serving loop
    skips the ladder for subsequent batches (decode at max_length
    directly). Break-even: rung-1 cost is ~0.37x of a full-length decode,
    so the ladder wins whenever closure saves more full-length rows than
    the rung-1 overhead costs — closure ~0.3 is roughly break-even at the
    measured shape; the default threshold 0.5 bails only on distributions
    clearly unlike the assumption.

    Closure definition (uniform across modes): a selected row is closed at
    rung 1 iff it does NOT re-decode at rung 2 — greedy: EOS fit inside
    the bucket; beam: the search CLOSED and the best hypothesis fit (see
    decode_selected_cascade's docstring).
    """
    threshold: float = 0.5
    min_rows: int = 64
    rows_selected: int = 0
    rows_closed_rung1: int = 0
    batches: int = 0
    bailed_out: bool = False
    rung_rows: Dict[int, int] = dataclasses.field(default_factory=dict)

    def record_rung1(self, selected: int, remaining: int) -> None:
        self.batches += 1
        self.rows_selected += int(selected)
        self.rows_closed_rung1 += int(selected) - int(remaining)

    def record_rung(self, bucket: int, entering: int) -> None:
        """Rows entering the decode at cache size `bucket` (rung >= 2 of
        the overall ladder when called from continue_cascade)."""
        self.rung_rows[int(bucket)] = (self.rung_rows.get(int(bucket), 0)
                                       + int(entering))

    def closure_rate(self) -> Optional[float]:
        if not self.rows_selected:
            return None
        return self.rows_closed_rung1 / self.rows_selected

    def should_bail(self) -> bool:
        rate = self.closure_rate()
        return (not self.bailed_out and rate is not None
                and self.rows_selected >= self.min_rows
                and rate < self.threshold)

    def snapshot(self) -> Dict:
        return {
            "batches": self.batches,
            "rows_selected": self.rows_selected,
            "rows_closed_rung1": self.rows_closed_rung1,
            "rung1_closure_rate": self.closure_rate(),
            "rows_entering_rung": dict(sorted(self.rung_rows.items())),
            "bailed_out": self.bailed_out,
            "threshold": self.threshold,
        }


def _postprocess(gen: ReportGenerator, device_out, n_images: int
                 ) -> List[GeneratedReport]:
    # ONE batched transfer for every output of the batch: on this
    # environment's tunneled TPU each separate np.asarray costs a full
    # ~29 ms host<->device roundtrip regardless of size, while
    # jax.device_get of the whole pytree moves everything in one
    # (~39 ms measured for 5 arrays); running it on the post thread also
    # overlaps the transfer with the next batch's device compute.
    import jax

    out = jax.device_get(device_out)
    ids = out["output_ids"]
    results = []
    for b in range(n_images):
        sel = out["decoded_mask"][b]
        region_sents = {}
        ordered = []
        for r in range(C.NUM_REGIONS):
            if sel[r]:
                text = gen.tokenizer.decode(ids[b, r], skip_special_tokens=True)
                region_sents[C.REGION_NAMES[r]] = text
                ordered.append(text)
        results.append(GeneratedReport(
            report=assemble_report(ordered, gen.similarity_fn, gen.threshold),
            region_sentences=region_sents,
            selected_regions=out["selected_regions"][b],
            class_detected=out["class_detected"][b],
            top_region_boxes=out["detections"]["top_region_boxes"][b]))
    return results


def generate_reports_pipelined(gen: ReportGenerator,
                               images: Sequence[Union[str, np.ndarray]],
                               batch_size: int = 16,
                               num_beams: int = 1,
                               max_length: int = 300,
                               early_stopping: bool = True,
                               selection_override: Optional[np.ndarray] = None,
                               kv_cache_dtype="int8",
                               device_resize: bool = True,
                               detect_image_chunk: Optional[int] = None,
                               mesh=None,
                               length_bucket_cascade: bool = True,
                               speculative_decode: bool = True,
                               initial_budget: Optional[int] = None,
                               weights_int8=False,
                               cascade_stats: Optional[CascadeStats] = None,
                               ) -> Iterator[List[GeneratedReport]]:
    """Yields one list of GeneratedReport per batch, in order.

    selection_override: optional [len(images), 29] bool mask decoded instead
    of the classifier's selection (see RGRG.generate).
    kv_cache_dtype: serving default "int8" (halves-to-quarters decode cache
    traffic; verified within tolerance vs the f32 path in
    tests/test_int8_cache.py); pass None for the parameter-dtype cache.
    device_resize: when a batch's images share one shape, upload raw uint8
    and run resize+pad+normalize inside the detect graph (ops/resize.py) —
    the 1-core host's C++ preprocess (~6 ms/image) was the product-path
    bottleneck once the TPU step was fused. Mixed-shape batches fall back
    to the host pipeline automatically.
    detect_image_chunk: bound peak detector HBM by running the detector
    over lax.map'd sub-batches of this size inside the same graph — lets
    batch_size exceed the detector's OOM point (B=128 on v5e) so the
    decode bucket amortizes further. Identical numerics.
    length_bucket_cascade: decode (greedy OR beam) runs through the static
    length-bucket ladder (decode everything at a short cache, re-decode
    only rows that hit the cap at the next bucket — each decode step
    attends over the FULL static cache buffer, so serving the reference's
    max_length=300 directly would cost ~5x the HBM traffic of a 64-slot
    bucket even though ~95% of region sentences are <60 tokens). Reports
    are identical to the full-length decode: greedy by prefix determinism,
    beam by the closed-search (`done`) criterion — see
    decode_selected_cascade's docstring. Costs one extra sync per extra
    bucket actually used; inactive when max_length already fits the first
    bucket.
    speculative_decode: classifier-driven batches after the first run
    detect + decode as ONE fused dispatch (detect_and_decode with the
    detector's own selection) at a PREDICTED static row budget — the max
    of the last few batches' actual ladder budgets — instead of waiting
    ~27 ms (plus the detect compute) for the selection-count readback
    before every decode dispatch. The selection is then fetched as a
    validation read AFTER the next batch's fused step is already queued,
    so the device never idles on it. A budget miss (actual selected rows
    > predicted budget) re-decodes that batch at the true budget from the
    already-computed region features — reports are identical either way
    (a larger-than-needed budget decodes the same rows; compaction is
    stable in flat order), only the miss latency differs. Batch 0 and a
    padded final batch use the synchronous split path (the first to seed
    the predictor, the pad case because its selection must be zeroed on
    the host before decode).
    initial_budget: calibrated warm start for the budget predictor — a
    row count expected per batch (rounded up the ladder). With it, batch
    0 speculates too instead of paying the synchronous seed; a low value
    just costs a budget-miss re-decode, never wrong reports.
    weights_int8: serve the decoder's per-layer matmul kernels as
    weight-only per-output-channel int8 (gpt2.quantize_decoder_weights).
    Measured throughput-NEUTRAL (1.00x greedy and beam,
    docs/artifacts/weights_int8_ab.json): XLA hoists the loop-invariant
    dequant out of the decode loop, so steady-state step bytes are
    unchanged — see quantize_decoder_weights' docstring. Default OFF; it
    halves decoder param HBM at rest (useful for multi-model
    co-residency) but perturbs every layer's matmul (~0.5% relative).
    weights_int8="pallas" additionally routes those matmuls through the
    Pallas kernel that consumes the int8 weights directly
    (ops/dense_wint8_pallas.py) — the dequant happens in VMEM inside the
    kernel, out of reach of the hoisting, so decode's per-step weight
    HBM traffic genuinely halves; measured 0.962x bf16 anyway (per-op
    launch overhead, docs/artifacts/weights_int8_pallas_ab.json) — use
    it when decoder HBM co-residency matters more than ~4% throughput.
    cascade_stats: optional CascadeStats collecting per-rung closure
    telemetry; also the bail-out policy knobs (threshold/min_rows). One is
    created internally when the cascade is active so the bail-out always
    guards the worst case — pass your own to read the telemetry afterwards
    (the eval driver publishes it in its artifact) or to tune/disable the
    policy (threshold=0 never bails).
    mesh: optional jax.sharding.Mesh for DATA-PARALLEL serving — params
    are replicated once, image batches are uploaded batch-sharded over the
    mesh's leading axis, and every jitted stage runs SPMD with XLA placing
    the collectives on ICI (SURVEY.md §2.6: DP is the one parallelism this
    workload needs). batch_size must be a multiple of mesh.size; a final
    partial batch is padded to batch_size (reusing the compiled graph) and
    the pad reports dropped."""
    import jax.numpy as jnp
    if kv_cache_dtype is None:
        kv = None
    elif kv_cache_dtype == "int8":  # matches the string AND np.dtype('int8')
        kv = jnp.int8
    else:
        # accept an actual jnp dtype (e.g. jnp.bfloat16); reject strings we
        # don't map — they would otherwise fail with an opaque jnp.zeros
        # dtype error deep inside the jitted prefill
        try:
            kv = jnp.dtype(kv_cache_dtype)
        except TypeError as e:
            raise ValueError(
                f"kv_cache_dtype must be 'int8', None, or a jnp dtype; "
                f"got {kv_cache_dtype!r}") from e
    batches = [images[i:i + batch_size]
               for i in range(0, len(images), batch_size)]
    if not batches:
        return

    if detect_image_chunk:
        if mesh is not None:
            # DP already divides the per-device batch by mesh.size; chunking
            # a batch-sharded leading dim through lax.map would force GSPMD
            # to broadcast chunks across devices — refuse the combination
            # rather than silently serving slow
            raise ValueError("detect_image_chunk cannot be combined with "
                             "mesh (DP already bounds per-device batch)")
        if batch_size % detect_image_chunk != 0:
            raise ValueError(
                f"batch_size {batch_size} must be a multiple of "
                f"detect_image_chunk {detect_image_chunk} (a non-dividing "
                f"chunk silently disables chunking and can OOM)")
    base_params = gen.params
    if weights_int8:
        from rgrg_tpu.models import gpt2
        base_params = dict(base_params)
        base_params["decoder"] = gpt2.quantize_decoder_weights(
            base_params["decoder"],
            layout="pallas" if weights_int8 == "pallas" else "xla")
    if mesh is not None:
        if batch_size % mesh.size != 0:
            raise ValueError(f"batch_size {batch_size} must be a multiple "
                             f"of mesh.size {mesh.size}")
        from rgrg_tpu.core import mesh as mesh_lib
        params = mesh_lib.replicate_pytree(base_params, mesh)
        shard = mesh_lib.batch_sharded(mesh)
    else:
        params, shard = base_params, None

    # upload in the detector's compute dtype: with bf16 detector compute the
    # first conv casts f32 inputs to bf16 anyway, so a bf16 upload is
    # numerically identical and halves the host->device image traffic
    bf16_upload = gen.model.cfg.detector.dtype == "bfloat16"

    def preprocess(batch):
        if ((mesh is not None or detect_image_chunk)
                and len(batch) < batch_size):
            # pad the final partial batch to the full size: keeps the
            # compiled graph count at one, the shard divisible, and the
            # detector chunking active (an unchunked partial batch could
            # be the one that OOMs)
            batch = list(batch) + [batch[-1]] * (batch_size - len(batch))
        if device_resize:
            raw, arrays = gen.preprocess_raw(batch, sharding=shard)
            if raw is not None:
                return raw  # (uint8 [B, H, W] on device, (wy, wx))
            batch = arrays  # mixed shapes: reuse the decoded images
        return gen.preprocess(
            batch, transfer_dtype=jnp.bfloat16 if bf16_upload else None,
            sharding=shard)

    import jax

    buckets_cfg = gen.model.cfg.generation.length_buckets
    b1 = min(buckets_cfg[0], max_length) if buckets_cfg else max_length
    cascade_on = length_bucket_cascade and max_length > b1
    # mutable: flips False when observed rung-1 closure says the ladder is
    # losing (CascadeStats docstring) — subsequent batches decode at
    # max_length directly
    cascade_active = cascade_on
    stats = cascade_stats
    if stats is None and cascade_on:
        stats = CascadeStats()
    pad_id = gen.model.cfg.decoder.pad_token_id

    recent_budgets: List[int] = []   # last few actual ladder budgets
    if initial_budget is not None:
        recent_budgets.append(
            gen.model.budget_for(initial_budget, batch_size, mesh=mesh))

    def record_budget(num_selected: int, b: int) -> None:
        recent_budgets.append(
            gen.model.budget_for(num_selected, b, mesh=mesh))
        del recent_budgets[:-4]

    def continue_cascade(out, ids, decoded, rem):
        """Second-and-later rungs of the length-bucket ladder for rows that
        filled bucket b1 (same logic for both fused branches); rem is the
        host bool mask of rows to re-decode."""
        ids = jnp.pad(ids, ((0, 0), (0, 0), (0, max_length - b1)),
                      constant_values=pad_id)
        if rem.any():
            rest = buckets_cfg[1:] or (max_length,)
            ids2, dec2 = gen.model.decode_selected_cascade(
                params, out["region_features"], rem, max_length,
                kv_cache_dtype=kv, mesh=mesh, buckets=rest,
                first_count=int(rem.sum()), num_beams=num_beams,
                early_stopping=early_stopping,
                stats=stats, stats_rung1=False)  # rung 1 recorded by caller
            ids = jnp.where(jnp.asarray(rem)[:, :, None], ids2, ids)
            decoded = decoded | dec2
        return ids, decoded

    def finalize_speculative(out, budget, was_cascade):
        """Validation readback for a speculatively-dispatched fused batch:
        called AFTER the next batch's work is queued, so the fetch (which
        waits out this batch's compute) overlaps the next batch's compute.
        was_cascade: whether the fused dispatch decoded at bucket b1 (the
        cascade flag AT DISPATCH TIME — a bail-out may have flipped the
        live flag since). Returns the postprocess-ready output dict."""
        fetch = [out["selected_regions"]]
        if was_cascade:
            fetch += [out["output_ids"][:, :, b1 - 1], out["decoded_mask"]]
            if num_beams > 1:
                fetch.append(out["decode_done"])
        got = jax.device_get(tuple(fetch))
        sel_np = got[0]
        num_selected = int(sel_np.sum())
        record_budget(num_selected, sel_np.shape[0])
        ids, decoded = out["output_ids"], out["decoded_mask"]
        if num_selected > budget:
            # budget miss (rare): rows beyond the predicted budget were not
            # decoded — re-decode everything at the true budget from the
            # already-computed features. Identical output to the
            # synchronous path, one extra decode of latency.
            ids, decoded = gen.model.decode_selected_cascade(
                params, out["region_features"], out["selected_regions"],
                max_length, kv_cache_dtype=kv, mesh=mesh,
                first_count=num_selected, num_beams=num_beams,
                early_stopping=early_stopping,
                buckets=None if was_cascade else (max_length,), stats=stats)
        elif was_cascade:
            last_col, dec1 = got[1], got[2]
            unfin = last_col != pad_id
            if num_beams > 1:
                unfin |= ~got[3]
            rem = sel_np & dec1 & unfin
            if stats is not None:
                stats.record_rung(b1, num_selected)
                stats.record_rung1(num_selected, int(rem.sum()))
            ids, decoded = continue_cascade(out, ids, decoded, rem)
        return {
            "output_ids": ids,
            "decoded_mask": decoded,
            "selected_regions": out["selected_regions"],
            "class_detected": out["class_detected"],
            "detections": {"top_region_boxes": out["top_region_boxes"]},
        }

    with cf.ThreadPoolExecutor(max_workers=1) as pre, \
            cf.ThreadPoolExecutor(max_workers=1) as post:
        pre_futures: List[cf.Future] = []

        def ensure_pre(j: int) -> None:
            # keep the preprocess thread up to two batches ahead (the
            # lookahead detect below consumes batch i+1 one iteration early)
            while len(pre_futures) <= min(j, len(batches) - 1):
                pre_futures.append(
                    pre.submit(preprocess, batches[len(pre_futures)]))

        ensure_pre(0)
        post_future = None
        det_ahead = {}  # batch index -> already-dispatched detect outputs
        # batch awaiting its speculative validation readback:
        # (fused outputs, n real images, predicted budget, was_cascade)
        spec_pending = None

        def submit_post(device_out, n_images):
            nonlocal post_future
            prev, post_future = post_future, post.submit(
                _postprocess, gen, device_out, n_images)
            return prev

        for i, batch in enumerate(batches):
            ensure_pre(i + 2)
            if cascade_active and stats is not None and stats.should_bail():
                # observed rung-1 closure is below the break-even envelope:
                # the ladder's first rung is now pure overhead — decode
                # subsequent batches at max_length directly (the cascade's
                # measured worst case is 1.37x SLOWER than full-length,
                # docs/artifacts/beam_eval_cascade.json)
                cascade_active = False
                stats.bailed_out = True

            pre_out = pre_futures[i].result()
            device_batch, mats = (pre_out if isinstance(pre_out, tuple)
                                  else (pre_out, None))
            if selection_override is None:
                padded = int(device_batch.shape[0]) > len(batch)
                if speculative_decode and recent_budgets and not padded:
                    # SPECULATIVE fused dispatch: decode the detector's own
                    # selection at the predicted budget — one dispatch, no
                    # readback on the critical path. Validated next
                    # iteration (finalize_speculative above).
                    budget = max(recent_budgets)
                    out = gen.model.detect_and_decode(
                        params, device_batch, None, budget,
                        b1 if cascade_active else max_length,
                        num_beams=num_beams, early_stopping=early_stopping,
                        kv_cache_dtype=kv, resize_mats=mats,
                        image_chunk=detect_image_chunk, mesh=mesh,
                        return_features=True,  # budget-miss re-decode input
                        return_done=cascade_active and num_beams > 1)
                    if spec_pending is not None:
                        prev = submit_post(
                            finalize_speculative(spec_pending[0],
                                                 spec_pending[2],
                                                 spec_pending[3]),
                            spec_pending[1])
                        if prev is not None:
                            yield prev.result()
                    spec_pending = (out, len(batch), budget, cascade_active)
                    continue

                # SYNCHRONOUS split path: batch 0 (seeds the budget
                # predictor), a padded final batch (pad-row selections must
                # be zeroed on the host), or speculative_decode=False.
                det = (det_ahead.pop(i) if i in det_ahead
                       else gen.model.detect(params, device_batch, mats,
                                             image_chunk=detect_image_chunk))
                # LOOKAHEAD (non-speculative serving only — under
                # speculation the fused next batch fills this role, and a
                # pre-dispatched detect would just recompute inside it):
                # enqueue detect for batch i+1 BEFORE reading back batch
                # i's selection. Dispatch is async, so the device works
                # on detect(i+1) while the host waits out the ~27 ms tunnel
                # fetch + bucket pick below — without this the device idles
                # at every readback (measured 43.6 -> 55+ r/s at B=32).
                # Only when preprocess(i+1) ALREADY finished: blocking on
                # its .result() here would serialize host preprocess into
                # the device critical path whenever preprocess is the slow
                # stage (mixed-shape batches on the host pipeline) — in
                # that case batch i+1's detect dispatches next iteration
                # as usual.
                if (not speculative_decode and i + 1 < len(batches)
                        and pre_futures[i + 1].done()):
                    nxt = pre_futures[i + 1].result()
                    nxt_imgs, nxt_mats = (nxt if isinstance(nxt, tuple)
                                          else (nxt, None))
                    det_ahead[i + 1] = gen.model.detect(
                        params, nxt_imgs, nxt_mats,
                        image_chunk=detect_image_chunk)
                if spec_pending is not None:
                    # previous batch was speculative: finalize it now that
                    # this batch's detect is queued (keeps yields in order)
                    prev = submit_post(
                        finalize_speculative(spec_pending[0],
                                             spec_pending[2],
                                             spec_pending[3]),
                        spec_pending[1])
                    if prev is not None:
                        yield prev.result()
                    spec_pending = None
                sel = det["selected_regions"]
                # the ONE unavoidable sync: the host picks the static decode
                # bucket from the classifier's selection count
                sel_np = np.asarray(sel)
                if sel_np.shape[0] > len(batch):
                    # padded final batch: pad rows are duplicate images whose
                    # classifier selections would inflate the bucket and
                    # decode throwaway rows — zero them on the host
                    sel_np = sel_np.copy()
                    sel_np[len(batch):] = False
                    sel = jnp.asarray(sel_np)
                num_selected = int(sel_np.sum())
                record_budget(num_selected, sel_np.shape[0])
                # after a bail-out the ladder is skipped (its first rung is
                # losing); when cascade_on is False the ladder was trivially
                # single-rung anyway, keep the original dispatch
                if length_bucket_cascade and (cascade_active or not cascade_on):
                    ids, decoded = gen.model.decode_selected_cascade(
                        params, det["region_features"], sel, max_length,
                        kv_cache_dtype=kv, mesh=mesh,
                        first_count=num_selected, num_beams=num_beams,
                        early_stopping=early_stopping, stats=stats)
                else:
                    r_budget = gen.model.budget_for(
                        num_selected, int(device_batch.shape[0]), mesh=mesh)
                    ids, decoded = gen.model.decode_selected(
                        params, det["region_features"], sel,
                        r_budget, max_length, num_beams=num_beams,
                        early_stopping=early_stopping, kv_cache_dtype=kv,
                        mesh=mesh)
                device_out = {
                    "output_ids": ids,
                    "decoded_mask": decoded,
                    "selected_regions": sel,
                    "class_detected": det["class_detected"],
                    "detections": {"top_region_boxes":
                                   det["top_region_boxes"]},
                }
            else:
                # caller-selected regions: no readback between the stages, so
                # detect+decode run as ONE dispatch (detect_and_decode) —
                # each separate jit call costs a host<->device roundtrip
                # serialized with compute on a tunneled TPU
                host_sel = selection_override[
                    i * batch_size:i * batch_size + len(batch)]
                pad_b = int(device_batch.shape[0]) - len(batch)
                if pad_b:  # mesh-padded final batch: pad rows select nothing
                    host_sel = np.concatenate(
                        [host_sel, np.zeros((pad_b, host_sel.shape[1]), bool)])
                sel = jnp.asarray(host_sel)
                r_budget = gen.model.budget_for(
                    int(host_sel.sum()), int(device_batch.shape[0]),
                    mesh=mesh)
                out = gen.model.detect_and_decode(
                    params, device_batch, sel, r_budget,
                    b1 if cascade_active else max_length,
                    num_beams=num_beams, early_stopping=early_stopping,
                    kv_cache_dtype=kv, resize_mats=mats,
                    image_chunk=detect_image_chunk, mesh=mesh,
                    return_features=cascade_active,
                    return_done=cascade_active and num_beams > 1)
                ids, decoded = out["output_ids"], out["decoded_mask"]
                if cascade_active:
                    # continue the length-bucket ladder for rows that hit
                    # the first cap: one tiny readback decides whether a
                    # second (much rarer) decode dispatch is needed at all.
                    # Bucket-final rule per mode: greedy = pad in the last
                    # slot; beam = that AND the search closed (decode_done)
                    # — see decode_selected_cascade's docstring.
                    fetch = (ids[:, :, b1 - 1], decoded)
                    if num_beams > 1:
                        last_col, dec1, done1 = jax.device_get(
                            fetch + (out["decode_done"],))
                    else:
                        last_col, dec1 = jax.device_get(fetch)
                        done1 = None
                    unfin = last_col != pad_id
                    if done1 is not None:
                        unfin |= ~done1
                    rem = host_sel & dec1 & unfin
                    if stats is not None:
                        n_sel = int(host_sel.sum())
                        stats.record_rung(b1, n_sel)
                        stats.record_rung1(n_sel, int(rem.sum()))
                    ids, decoded = continue_cascade(out, ids, decoded, rem)
                device_out = {
                    "output_ids": ids,
                    "decoded_mask": decoded,
                    "selected_regions": sel,
                    "class_detected": out["class_detected"],
                    "detections": {"top_region_boxes":
                                   out["top_region_boxes"]},
                }

            # the post thread fetches everything in one batched device_get
            # overlapped with the next batch's compute
            prev = submit_post(device_out, len(batch))
            if prev is not None:
                yield prev.result()

        if spec_pending is not None:
            # the stream's last batch was speculative: validate it now
            prev = submit_post(
                finalize_speculative(spec_pending[0], spec_pending[2],
                                     spec_pending[3]),
                spec_pending[1])
            if prev is not None:
                yield prev.result()
        yield post_future.result()
