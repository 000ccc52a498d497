"""Utils tests: summary, plots, metric writer, chexbert trainer."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from rgrg_tpu.utils.logging import MetricWriter
from rgrg_tpu.utils.plots import plot_boxes, plot_region_groups
from rgrg_tpu.utils.summary import param_counts, summarize


def test_param_counts():
    tree = {"a": {"w": np.zeros((3, 4)), "b": np.zeros(4)},
            "c": {"d": {"w": np.zeros(7)}}}
    counts = param_counts(tree, depth=1)
    assert counts == {"a": 16, "c": 7}
    text = summarize(tree)
    assert "TOTAL" in text and "23" in text


def test_metric_writer(tmp_path):
    w = MetricWriter(str(tmp_path), use_tensorboard=False)
    w.write_scalars(1, {"loss": 0.5, "nested": {"x": 2}})
    w.write_config({"a": 1})
    w.write_texts("reports", ["hello"])
    w.close()
    rec = json.loads(open(tmp_path / "metrics.jsonl").read().splitlines()[0])
    assert rec["loss"] == 0.5 and rec["nested/x"] == 2.0
    assert (tmp_path / "run_config.txt").exists()
    assert "hello" in open(tmp_path / "reports.txt").read()


def test_metric_writer_images(tmp_path):
    w = MetricWriter(str(tmp_path), use_tensorboard=False)
    img = np.zeros((32, 32, 3), np.uint8)
    w.write_images(5, {"group/fig": img})
    assert os.path.exists(tmp_path / "figures" / "group_fig_5.png")


def test_plot_boxes():
    img = np.random.default_rng(0).uniform(0, 1, (512, 512)).astype(np.float32)
    gt = np.zeros((29, 4)); gt[0] = [10, 10, 200, 300]
    pred = np.zeros((29, 4)); pred[0] = [15, 15, 210, 310]
    fig = plot_boxes(img, gt, pred, ["right lung"],
                     sentences={"right lung": "clear"}, title="t")
    assert fig.ndim == 3 and fig.shape[2] == 3 and fig.dtype == np.uint8
    groups = plot_region_groups(img, gt, pred)
    assert len(groups) == 5


def test_chexbert_train_step_reduces_loss():
    from rgrg_tpu.eval.chexbert import BertConfig, convert_chexbert
    from rgrg_tpu.eval.chexbert_train import chexbert_loss, train_chexbert
    from transformers import BertConfig as HFC, BertModel
    import torch

    torch.manual_seed(0)
    hf = BertModel(HFC(vocab_size=30, hidden_size=16, num_hidden_layers=1,
                       num_attention_heads=2, intermediate_size=32,
                       max_position_embeddings=24))
    sd = {f"bert.{k}": v.numpy() for k, v in hf.state_dict().items()}
    rng = np.random.default_rng(0)
    for j in range(14):
        n = 2 if j == 13 else 4
        sd[f"linear_heads.{j}.weight"] = rng.normal(0, 0.1, (n, 16)).astype(np.float32)
        sd[f"linear_heads.{j}.bias"] = np.zeros(n, np.float32)
    params = jax.tree.map(jnp.asarray, convert_chexbert(sd))
    cfg = BertConfig(vocab_size=30, hidden=16, layers=1, heads=2,
                     intermediate=32, max_positions=24)

    ids = rng.integers(0, 30, (4, 10))
    mask = np.ones((4, 10), np.float32)
    labels = np.concatenate([rng.integers(0, 4, (13, 4)),
                             rng.integers(0, 2, (1, 4))])
    l0 = float(chexbert_loss(params, jnp.asarray(ids), jnp.asarray(mask),
                             jnp.asarray(labels), cfg))
    batches = [(ids, mask, labels)] * 5
    params, losses = train_chexbert(params, batches, learning_rate=1e-3, cfg=cfg)
    assert losses[-1] < l0
