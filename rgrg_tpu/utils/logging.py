"""Observability: metric writers + profiler hooks.

The reference writes tensorboard scalars per loss/metric/region plus run
folders with config dumps and text artifacts (SURVEY.md §5). Here:
  - MetricWriter: tensorboard via tf.summary when tensorflow is importable,
    always mirrored to a JSONL file (greppable artifacts for parity diffs);
  - trace(): jax.profiler trace context for on-demand TPU profiles (the
    reference has no profiler at all).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Mapping, Optional


class MetricWriter:
    def __init__(self, run_dir: str, use_tensorboard: bool = True):
        os.makedirs(run_dir, exist_ok=True)
        self.run_dir = run_dir
        self.jsonl = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf  # noqa: F401
                self._tb = tf.summary.create_file_writer(
                    os.path.join(run_dir, "tb"))
            except Exception:
                self._tb = None

    def write_scalars(self, step: int, scalars: Mapping[str, float]) -> None:
        flat = _flatten(scalars)
        rec = {"step": int(step), "time": time.time(), **flat}
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in flat.items():
                    tf.summary.scalar(k, float(v), step=int(step))
                self._tb.flush()

    def write_images(self, step: int, images: Mapping[str, Any]) -> None:
        """images: name -> RGB uint8 [H, W, 3] (e.g. from utils.plots)."""
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, img in images.items():
                    tf.summary.image(k, img[None], step=int(step))
                self._tb.flush()
        else:  # fall back to PNG artifacts
            from PIL import Image
            img_dir = os.path.join(self.run_dir, "figures")
            os.makedirs(img_dir, exist_ok=True)
            for k, img in images.items():
                safe = k.replace("/", "_")
                Image.fromarray(img).save(
                    os.path.join(img_dir, f"{safe}_{step}.png"))

    def write_config(self, config: Any) -> None:
        with open(os.path.join(self.run_dir, "run_config.txt"), "w") as f:
            f.write(repr(config))

    def write_texts(self, name: str, texts) -> None:
        with open(os.path.join(self.run_dir, f"{name}.txt"), "w") as f:
            for t in texts:
                f.write(t + "\n" + "=" * 30 + "\n")

    def close(self) -> None:
        self.jsonl.close()


def _flatten(d: Mapping[str, Any], prefix: str = "") -> Dict[str, float]:
    out: Dict[str, float] = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, Mapping):
            out.update(_flatten(v, key + "/"))
        else:
            try:
                out[key] = float(v)
            except (TypeError, ValueError):
                pass
    return out


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
