"""Standalone full-budget detector roofline (VERDICT r4 #2).

Per-stage device timings + XLA cost-analysis FLOPs/bytes -> MFU and
achieved GB/s for the product detector at the headline batch: backbone
convs, RPN head + NMS, RoI pooled-construct, box head (fc6+fc7), and the
remainder (predictor, top-1-per-class, classifier MLPs) — the stages of
the reference forward (object_detector.py:184-261).

bench.py runs the same probe with a tight time budget at round end; this
script is the generous-budget run whose output is the committed artifact
(and whose compiles warm the remote compile-server cache so the round-end
probe stays cheap).

Writes docs/artifacts/detect_roofline.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench as B

    B.wait_for_backend()
    model, params = B.build()
    budget, served = B.certify_budget(
        B.calibrate_selection_threshold(model, params), params)

    pre = B.tunnel_canary()
    out = B.bench_roofline_detect(served, params, time_budget_s=2400.0,
                                  roundtrip_ms=pre["roundtrip_ms"])
    out["canary_pre"] = pre
    out["canary_post"] = B.tunnel_canary()
    out["certified_proposal_budget"] = budget

    print(json.dumps(out, indent=2))
    path = "docs/artifacts/detect_roofline.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
