"""rgrg_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for region-guided
radiology report generation, with the capabilities of ttanida/rgrg (CVPR 2023).

This is NOT a port of the PyTorch reference: the compute path is built from
scratch on JAX functional transforms, static shapes, and Pallas kernels.

Layers (bottom -> top):
  core    — constants, typed configs, mesh/sharding helpers, checkpoint IO
  ops     — box math, anchors, RoIAlign + NMS (jnp reference + Pallas kernels)
  models  — ResNet-50 backbone, RPN, RoI heads, classifiers, GPT-2 pseudo-attn
  decode  — greedy / beam decoding (lax.while_loop state machines)
  text    — tokenizer, sentence splitting, report assembly/dedup (host side)
  train   — losses, target assignment, pjit train steps
  eval    — NLG metrics, CheXbert clinical-efficacy metrics
  data    — host input pipeline + dataset ETL
"""

import os as _os

# This framework never fetches from the network; make HF libs fail fast
# instead of hanging when a user passes a hub id without local files.
_os.environ.setdefault("HF_HUB_OFFLINE", "1")
_os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

__version__ = "0.1.0"
