"""Checkpoint save/load (orbax) and full reference-checkpoint conversion.

Unlike the reference — whose resume path is commented out
(train_full_model.py:565-586) — save/restore of the FULL training state
(params, optimizer state, step) is first-class here.

`convert_full_checkpoint` ingests the published RGRG .pt files: the
checkpoint dict {"model": state_dict, "optimizer": ..., ...}
(evaluate_model.py:576-591) or a bare detector state_dict
(training_script_object_detector.py:413-430), handling every weight
convention quirk (HF Conv1D layout, rpn conv rename, Sequential backbone
keys, wte-position quirk is a config flag not a weight issue).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from rgrg_tpu.core import torch_convert as tc


# ---------------------------------------------------------------------------
# orbax state IO
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, state: Any, force: bool = True) -> None:
    """state: any pytree (e.g. trainer.TrainState or a params dict)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=force)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree; `target` (same structure, abstract or concrete
    arrays) drives dtypes/shardings when given."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is None:
        return ckptr.restore(path)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype) if hasattr(x, "shape") else x,
        target)
    return ckptr.restore(path, abstract)


# ---------------------------------------------------------------------------
# reference .pt conversion
# ---------------------------------------------------------------------------

def normalize_rpn_conv_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Newer torchvision saves 'rpn.head.conv.0.0.*'; older 'rpn.head.conv.*'
    (reference workaround at train_full_model.py:290-293). Normalize to the
    old name, which convert_rpn_head handles either way."""
    out = dict(sd)
    for suffix in ("weight", "bias"):
        new = f"rpn.head.conv.0.0.{suffix}"
        old = f"rpn.head.conv.{suffix}"
        for prefix in ("", "object_detector."):
            if prefix + new in out and prefix + old not in out:
                out[prefix + old] = out.pop(prefix + new)
    return out


def convert_full_checkpoint(state_dict: Mapping[str, Any],
                            num_layers: int = 24,
                            with_lm: bool = True) -> Dict[str, Any]:
    """Reference ReportGenerationModel state_dict -> our params tree
    {"detector": {params, batch_stats}, "decoder": ...}.

    Keys: object_detector.*, binary_classifier_region_selection.*,
    binary_classifier_region_abnormal.*, language_model.* .
    """
    sd = tc.state_dict_to_numpy(state_dict)
    if sd and all(k.startswith("module.") for k in sd):
        # nn.DataParallel-wrapped save (the convention the reference's
        # CheXbert weights use, evaluate_language_model.py:166-174) —
        # strip the uniform prefix so wrapped full-model saves load too.
        sd = tc.strip_prefix(sd, "module.")
    sd = normalize_rpn_conv_keys(sd)

    det_sd = tc.strip_prefix(sd, "object_detector.")
    sel_sd = tc.strip_prefix(sd, "binary_classifier_region_selection.")
    abn_sd = tc.strip_prefix(sd, "binary_classifier_region_abnormal.")
    detector = tc.convert_detector(det_sd, selection_sd=sel_sd, abnormal_sd=abn_sd)

    out: Dict[str, Any] = {"detector": detector}
    lm_sd = tc.strip_prefix(sd, "language_model.")
    if with_lm and lm_sd:
        out["decoder"] = tc.convert_language_model(lm_sd, num_layers=num_layers)
    return out


def convert_detector_checkpoint(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Stage-1 detector-only checkpoint (bare ObjectDetector state_dict)."""
    sd = tc.state_dict_to_numpy(state_dict)
    sd = normalize_rpn_conv_keys(sd)
    return tc.convert_detector(sd)


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """torch.load a reference .pt on CPU and return the model state_dict
    (handles both {'model': sd, ...} dicts and bare state dicts)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt and isinstance(ckpt["model"], dict):
        return ckpt["model"]
    return ckpt
