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


def _conv(sd: Mapping[str, np.ndarray], key: str) -> Dict[str, np.ndarray]:
    out = {"kernel": conv_kernel(sd[f"{key}.weight"])}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _linear(sd: Mapping[str, np.ndarray], key: str) -> Dict[str, np.ndarray]:
    out = {"kernel": linear_kernel(sd[f"{key}.weight"])}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def fc6_kernel_nchw_to_nhwc(w: np.ndarray, channels: int = 2048,
                            pool: int = 8) -> np.ndarray:
    """TwoMLPHead fc6 consumes a flattened RoI feature map. torch flattens
    NCHW (channel-major), our NHWC flatten is spatial-major; permute the
    input axis accordingly. w: [out, C*P*P] -> [P*P*C, out]."""
    out_dim = w.shape[0]
    w = w.reshape(out_dim, channels, pool, pool)
    w = np.transpose(w, (0, 2, 3, 1)).reshape(out_dim, pool * pool * channels)
    return np.transpose(w, (1, 0))


def convert_rpn_head(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Keys under 'rpn.head.'; handles the torchvision version rename where
    'conv.weight' became 'conv.0.0.weight' (reference train_full_model.py:290-293)."""
    conv_key = "conv" if "conv.weight" in sd else "conv.0.0"
    return {
        "conv": _conv(sd, conv_key),
        "cls_logits": _conv(sd, "cls_logits"),
        "bbox_pred": _conv(sd, "bbox_pred"),
    }


def convert_box_head(sd: Mapping[str, np.ndarray], channels: int = 2048,
                     pool: int = 8) -> Dict[str, Any]:
    """Keys under 'roi_heads.box_head.'."""
    return {
        "fc6": {"kernel": fc6_kernel_nchw_to_nhwc(sd["fc6.weight"], channels, pool),
                "bias": sd["fc6.bias"]},
        "fc7": _linear(sd, "fc7"),
    }


def convert_classifier_mlp(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """nn.Sequential Linear/ReLU stack: classifier.0/2/4 -> fc0/fc1/fc2."""
    return {"fc0": _linear(sd, "classifier.0"),
            "fc1": _linear(sd, "classifier.2"),
            "fc2": _linear(sd, "classifier.4")}


def convert_detector(sd: Mapping[str, np.ndarray],
                     selection_sd: Mapping[str, np.ndarray] | None = None,
                     abnormal_sd: Mapping[str, np.ndarray] | None = None,
                     stage_sizes=(3, 4, 6, 3)) -> Dict[str, Any]:
    """Convert a reference ObjectDetector state_dict (keys backbone./rpn./
    roi_heads.) plus optional classifier state_dicts into RegionDetector
    {params, batch_stats} trees. Classifier heads default to zero-init
    placeholders only if their state dicts are not given."""
    backbone_named = sequential_backbone_to_named(strip_prefix(sd, "backbone."))
    bb = convert_resnet_backbone(backbone_named, stage_sizes=stage_sizes)

    params: Dict[str, Any] = {"backbone": bb["params"]}
    stats: Dict[str, Any] = {"backbone": bb["batch_stats"]}

    params["rpn_head"] = convert_rpn_head(strip_prefix(sd, "rpn.head."))
    roi = strip_prefix(sd, "roi_heads.")
    params["box_head"] = convert_box_head(strip_prefix(roi, "box_head."))
    params["box_predictor"] = {
        "cls_score": _linear(roi, "box_predictor.cls_score"),
        "bbox_pred": _linear(roi, "box_predictor.bbox_pred"),
    }
    params["dim_reduction"] = _linear(roi, "dim_reduction")

    if selection_sd is not None:
        params["selection_classifier"] = convert_classifier_mlp(selection_sd)
    if abnormal_sd is not None:
        params["abnormal_classifier"] = convert_classifier_mlp(abnormal_sd)
    return {"params": params, "batch_stats": stats}


def _conv1d_hf(sd: Mapping[str, np.ndarray], key: str) -> Dict[str, np.ndarray]:
    """HF Conv1D stores weight [in, out] — our layout exactly, no transpose."""
    return {"kernel": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _ln(sd: Mapping[str, np.ndarray], key: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def convert_gpt2_transformer(sd: Mapping[str, np.ndarray], num_layers: int,
                             with_pseudo_attention: bool) -> Dict[str, Any]:
    """Keys at HF GPT2Model level (wte.weight, h.{i}.attn.c_attn.weight, ...)
    -> rgrg_tpu.models.gpt2 params (without feature_transform).

    with_pseudo_attention: expect trainable uk/uv per layer (reference
    checkpoints); plain HF checkpoints get zero-initialized uk/uv.
    """
    d = sd["wte.weight"].shape[1]
    params: Dict[str, Any] = {
        "wte": {"embedding": sd["wte.weight"]},
        "wpe": {"embedding": sd["wpe.weight"]},
        "ln_f": _ln(sd, "ln_f"),
    }
    for i in range(num_layers):
        h = f"h.{i}"
        attn = {
            "c_attn": _conv1d_hf(sd, f"{h}.attn.c_attn"),
            "c_proj": _conv1d_hf(sd, f"{h}.attn.c_proj"),
        }
        if with_pseudo_attention:
            attn["uk"] = _linear(sd, f"{h}.attn.uk")
            attn["uv"] = _linear(sd, f"{h}.attn.uv")
        else:
            attn["uk"] = {"kernel": np.zeros((d, d), np.float32),
                          "bias": np.zeros((d,), np.float32)}
            attn["uv"] = {"kernel": np.zeros((d, d), np.float32),
                          "bias": np.zeros((d,), np.float32)}
        params[f"h_{i}"] = {
            "ln_1": _ln(sd, f"{h}.ln_1"),
            "ln_2": _ln(sd, f"{h}.ln_2"),
            "attn": attn,
            "mlp": {"c_fc": _conv1d_hf(sd, f"{h}.mlp.c_fc"),
                    "c_proj": _conv1d_hf(sd, f"{h}.mlp.c_proj")},
        }
    return params


def convert_language_model(sd: Mapping[str, np.ndarray],
                           num_layers: int = 24) -> Dict[str, Any]:
    """Convert a reference LanguageModel state_dict (keys at the
    language_model.py LanguageModel level) to decoder params.

    The reference registers the same modules under several attribute paths
    (gpt_with_lm_head.*, gpt.*, wte.*, gpt2_blocks.*); we read the canonical
    'gpt_with_lm_head.transformer.' hierarchy, which always exists and keeps
    uk/uv under h.{i}.attn.
    """
    t = strip_prefix(sd, "gpt_with_lm_head.transformer.")
    params = convert_gpt2_transformer(t, num_layers, with_pseudo_attention=True)
    fst = strip_prefix(sd, "feature_space_transformation_nn.")
    params["feature_transform"] = {"fc0": _linear(fst, "0"), "fc1": _linear(fst, "2")}
    return params


def convert_hf_gpt2_lm(sd: Mapping[str, np.ndarray],
                       num_layers: int) -> Dict[str, Any]:
    """Convert a plain HF GPT2LMHeadModel state_dict (transformer.* keys).
    feature_transform is identity-free zero init (uk/uv likewise) — for
    converter validation and from-scratch pseudo-attention training."""
    t = strip_prefix(sd, "transformer.")
    params = convert_gpt2_transformer(t, num_layers, with_pseudo_attention=False)
    d = params["wte"]["embedding"].shape[1]
    z = lambda *s: np.zeros(s, np.float32)  # noqa: E731
    params["feature_transform"] = {
        "fc0": {"kernel": z(d, d), "bias": z(d)},
        "fc1": {"kernel": z(d, d), "bias": z(d)},
    }
    return params


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
