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
from typing import Iterator, List, Optional, Sequence, Union

import numpy as np

from rgrg_tpu.inference import GeneratedReport, ReportGenerator
from rgrg_tpu.core import constants as C
from rgrg_tpu.text.report import assemble_report


def _postprocess(gen: ReportGenerator, out, n_images: int) -> List[GeneratedReport]:
    ids = np.asarray(out["output_ids"])  # device sync happens here
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
                               selection_override: Optional[np.ndarray] = None
                               ) -> Iterator[List[GeneratedReport]]:
    """Yields one list of GeneratedReport per batch, in order.

    selection_override: optional [len(images), 29] bool mask decoded instead
    of the classifier's selection (see RGRG.generate)."""
    batches = [images[i:i + batch_size]
               for i in range(0, len(images), batch_size)]
    if not batches:
        return

    with cf.ThreadPoolExecutor(max_workers=1) as pre, \
            cf.ThreadPoolExecutor(max_workers=1) as post:
        pre_futures = [pre.submit(gen.preprocess, batches[0])]
        post_future = None

        for i, batch in enumerate(batches):
            # start preprocessing the next batch before touching the device
            if i + 1 < len(batches):
                pre_futures.append(pre.submit(gen.preprocess, batches[i + 1]))

            device_batch = pre_futures[i].result()
            det = gen.model.detect(gen.params, device_batch)
            if selection_override is None:
                sel = det["selected_regions"]
            else:
                import jax.numpy as jnp
                sel = jnp.asarray(
                    selection_override[i * batch_size:i * batch_size + len(batch)])
            num_selected = int(np.asarray(sel).sum())
            r_budget = gen.model.budget_for(num_selected, len(batch))
            ids, decoded = gen.model.decode_selected(
                gen.params, det["region_features"], sel,
                r_budget, max_length, num_beams=num_beams,
                early_stopping=early_stopping)
            out = {
                "output_ids": ids,
                "decoded_mask": np.asarray(decoded),
                "selected_regions": np.asarray(sel),
                "class_detected": np.asarray(det["class_detected"]),
                "detections": {"top_region_boxes":
                               np.asarray(det["top_region_boxes"])},
            }

            if post_future is not None:
                yield post_future.result()
            post_future = post.submit(_postprocess, gen, out, len(batch))

        yield post_future.result()
