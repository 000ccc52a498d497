"""PyTorch checkpoint -> JAX pytree conversion.

Handles the published RGRG checkpoints' weight conventions (SURVEY.md §5):
  - torch conv OIHW -> flax HWIO
  - torch Linear [out, in] -> flax Dense kernel [in, out]
  - HF Conv1D layers ALREADY store [in, out] (no transpose)
  - torchvision rpn key rename across versions ("rpn.head.conv.weight" vs
    "rpn.head.conv.0.0.weight", reference train_full_model.py:290-293)
  - CheXbert DataParallel "module." prefixes
  - reference backbone is nn.Sequential so children are numeric
    ("backbone.0" == conv1, "backbone.4" == layer1, ...)

This module is pure numpy: pass `state_dict_to_numpy(torch.load(...))`.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def state_dict_to_numpy(state_dict: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Detach a torch state_dict into plain numpy arrays (torch optional)."""
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def strip_prefix(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    """torch Linear [out, in] -> flax Dense [in, out]."""
    return np.transpose(w, (1, 0))


def _bn(sd: Mapping[str, np.ndarray], key: str):
    params = {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}
    stats = {"mean": sd[f"{key}.running_mean"], "var": sd[f"{key}.running_var"]}
    return params, stats


def convert_resnet_backbone(sd: Mapping[str, np.ndarray],
                            stage_sizes=(3, 4, 6, 3)):
    """Convert a torchvision-style ResNet state_dict (keys conv1, bn1,
    layerL.B.*) to ResNetBackbone {params, batch_stats} trees."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["conv1"] = {"kernel": conv_kernel(sd["conv1.weight"])}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")

    for stage, num_blocks in enumerate(stage_sizes, start=1):
        for block in range(num_blocks):
            t = f"layer{stage}.{block}"
            f = f"layer{stage}_{block}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            for i in (1, 2, 3):
                p[f"conv{i}"] = {"kernel": conv_kernel(sd[f"{t}.conv{i}.weight"])}
                p[f"bn{i}"], s[f"bn{i}"] = _bn(sd, f"{t}.bn{i}")
            if f"{t}.downsample.0.weight" in sd:
                p["downsample_conv"] = {
                    "kernel": conv_kernel(sd[f"{t}.downsample.0.weight"])}
                p["downsample_bn"], s["downsample_bn"] = _bn(sd, f"{t}.downsample.1")
            params[f] = p
            stats[f] = s
    return {"params": params, "batch_stats": stats}


def sequential_backbone_to_named(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Map the reference's nn.Sequential backbone keys to torchvision names.

    Reference object_detector.py:58 wraps resnet children in nn.Sequential:
    0=conv1, 1=bn1, 2=relu, 3=maxpool, 4..7=layer1..4.
    """
    rename = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
              "6": "layer3", "7": "layer4"}
    out = {}
    for k, v in sd.items():
        head, _, rest = k.partition(".")
        if head in rename:
            out[f"{rename[head]}.{rest}" if rest else rename[head]] = v
    return out
