"""Pipelined serving driver: ordered, complete, matches direct API."""

import numpy as np
import cv2
import jax
import pytest

from rgrg_tpu.inference import ReportGenerator
from rgrg_tpu.models.full_model import RGRG
from rgrg_tpu.serving import generate_reports_pipelined
from rgrg_tpu.text.tokenizer import GPT2Tokenizer

from tests.test_full_model import SMOKE_CFG


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    model = RGRG(cfg=SMOKE_CFG)
    params = model.init(jax.random.PRNGKey(0))
    gen = ReportGenerator(params, GPT2Tokenizer.dummy(), cfg=SMOKE_CFG)
    d = tmp_path_factory.mktemp("imgs")
    paths = []
    for i in range(5):
        p = str(d / f"i{i}.png")
        cv2.imwrite(p, (np.random.default_rng(i).uniform(0, 255, (600, 500))
                        ).astype(np.uint8))
        paths.append(p)
    return gen, paths


def test_pipelined_matches_direct(setup):
    gen, paths = setup
    direct = gen.generate_reports(paths, num_beams=1, max_length=6,
                                  early_stopping=False)
    # kv_cache_dtype=None: the direct API decodes with the param-dtype
    # cache, so the parity check must compare like with like (the pipeline's
    # serving default is int8, whose quantization noise is NOT guaranteed to
    # preserve greedy argmax token-for-token)
    piped = [r for chunk in generate_reports_pipelined(
        gen, paths, batch_size=2, num_beams=1, max_length=6,
        kv_cache_dtype=None) for r in chunk]
    assert len(piped) == len(direct) == 5
    for a, b in zip(piped, direct):
        assert a.report == b.report
        np.testing.assert_array_equal(a.selected_regions, b.selected_regions)


def test_pipelined_empty():
    model = RGRG(cfg=SMOKE_CFG)
    params = model.init(jax.random.PRNGKey(0))
    gen = ReportGenerator(params, GPT2Tokenizer.dummy(), cfg=SMOKE_CFG)
    assert list(generate_reports_pipelined(gen, [], batch_size=2)) == []


def test_pipelined_kv_cache_dtype_spellings(setup):
    """np.dtype('int8') equals 'int8' under == but not under hash — the
    normalization must accept it (and real jnp dtypes) and reject unknown
    strings with a clear ValueError, not an opaque jit error."""
    gen, paths = setup
    kwargs = dict(batch_size=2, num_beams=1, max_length=4)
    a = [r for chunk in generate_reports_pipelined(
        gen, paths[:2], kv_cache_dtype="int8", **kwargs) for r in chunk]
    b = [r for chunk in generate_reports_pipelined(
        gen, paths[:2], kv_cache_dtype=np.dtype("int8"), **kwargs)
        for r in chunk]
    assert [r.report for r in a] == [r.report for r in b]
    with pytest.raises(ValueError, match="kv_cache_dtype"):
        list(generate_reports_pipelined(gen, paths[:2],
                                        kv_cache_dtype="bf16", **kwargs))


def test_pipelined_selection_override(setup):
    gen, paths = setup
    override = np.zeros((5, 29), bool)
    override[:, [0, 3, 7]] = True
    piped = [r for chunk in generate_reports_pipelined(
        gen, paths, batch_size=2, num_beams=1, max_length=6,
        selection_override=override) for r in chunk]
    assert len(piped) == 5
    for r in piped:
        np.testing.assert_array_equal(r.selected_regions, override[0])
        # every overridden region decodes (budget >= 3 selected rows)
        assert set(r.region_sentences) == {
            name for name, i in
            __import__("rgrg_tpu.core.constants",
                       fromlist=["ANATOMICAL_REGIONS"]).ANATOMICAL_REGIONS.items()
            if i in (0, 3, 7)}


def test_device_resize_matches_host_preprocess(setup):
    """The uint8 device-resize path (ops/resize.py) vs the host C++/cv2
    pipeline, end to end through serving: identical reports (differences
    would need a pixel to land within f32-summation-order distance of a
    uint8 rounding boundary AND flip a detection/token — vanishing)."""
    gen, paths = setup
    kwargs = dict(batch_size=2, num_beams=1, max_length=6,
                  kv_cache_dtype=None)
    dev = [r for chunk in generate_reports_pipelined(
        gen, paths, device_resize=True, **kwargs) for r in chunk]
    host = [r for chunk in generate_reports_pipelined(
        gen, paths, device_resize=False, **kwargs) for r in chunk]
    assert len(dev) == len(host) == 5
    for a, b in zip(dev, host):
        assert a.report == b.report
        np.testing.assert_array_equal(a.selected_regions, b.selected_regions)
        np.testing.assert_allclose(a.top_region_boxes, b.top_region_boxes,
                                   atol=0.5)


def test_generate_selection_override(setup):
    gen, _ = setup
    import jax.numpy as jnp
    images = jax.random.normal(jax.random.PRNGKey(3), (2, 512, 512, 1)) * 0.3
    override = np.zeros((2, 29), bool)
    override[:, :4] = True
    out = gen.model.generate(gen.params, images, max_length=6,
                             selection_override=jnp.asarray(override))
    np.testing.assert_array_equal(out["selected_regions"], override)
    assert out["decoded_mask"][:, :4].all()


def test_pipelined_detect_image_chunk_matches(setup):
    """detect_image_chunk through the whole serving pipeline (both the
    fused override branch and the classifier-driven branch) must be
    report-identical to the unchunked pipeline."""
    gen, paths = setup
    kwargs = dict(batch_size=4, num_beams=1, max_length=6,
                  kv_cache_dtype=None)
    override = np.zeros((5, 29), bool)
    override[:, [0, 3]] = True
    for ovr in (None, override):
        base = [r for chunk in generate_reports_pipelined(
            gen, paths, selection_override=ovr, **kwargs) for r in chunk]
        chunked = [r for chunk in generate_reports_pipelined(
            gen, paths, selection_override=ovr, detect_image_chunk=2,
            **kwargs) for r in chunk]
        assert len(base) == len(chunked) == 5
        for a, b in zip(base, chunked):
            assert a.report == b.report
            np.testing.assert_array_equal(a.selected_regions,
                                          b.selected_regions)


def test_detect_image_chunk_validation(setup):
    gen, paths = setup
    with pytest.raises(ValueError, match="multiple"):
        list(generate_reports_pipelined(gen, paths, batch_size=4,
                                        detect_image_chunk=3))
    from rgrg_tpu.core.mesh import make_mesh
    with pytest.raises(ValueError, match="mesh"):
        list(generate_reports_pipelined(gen, paths, batch_size=4,
                                        detect_image_chunk=2,
                                        mesh=make_mesh(num_devices=2)))


def test_make_mesh_rejects_too_many_devices():
    from rgrg_tpu.core.mesh import make_mesh
    with pytest.raises(ValueError, match="available"):
        make_mesh(num_devices=99)


@pytest.mark.parametrize("num_beams", [1, 3])
def test_pipelined_cascade_matches_full_decode(setup, num_beams):
    """Length-bucket cascade through serving (both branches) must be
    report-identical to a single full-length decode: greedy is
    prefix-deterministic; beam rows are only bucket-final once their
    search closed (decode_done) so finalize reads the same finished pool
    (decode_selected_cascade docstring)."""
    import dataclasses

    from rgrg_tpu.core.config import GenerationConfig
    from tests.test_full_model import SMOKE_CFG as _SMOKE

    gen, paths = setup
    cfg2 = dataclasses.replace(
        _SMOKE, generation=GenerationConfig(length_buckets=(4, 12)))
    gen2 = ReportGenerator(gen.params, GPT2Tokenizer.dummy(), cfg=cfg2,
                           similarity_fn=None)
    override = np.zeros((5, 29), bool)
    override[:, [0, 3, 7]] = True
    kwargs = dict(batch_size=2, num_beams=num_beams, max_length=12,
                  kv_cache_dtype=None)
    for ovr in (None, override):
        full = [r for chunk in generate_reports_pipelined(
            gen2, paths, selection_override=ovr,
            length_bucket_cascade=False, **kwargs) for r in chunk]
        casc = [r for chunk in generate_reports_pipelined(
            gen2, paths, selection_override=ovr,
            length_bucket_cascade=True, **kwargs) for r in chunk]
        assert len(full) == len(casc) == 5
        for a, b in zip(full, casc):
            assert a.report == b.report
            assert a.region_sentences == b.region_sentences
            np.testing.assert_array_equal(a.selected_regions,
                                          b.selected_regions)


def test_mixed_shape_batch_falls_back_and_matches(setup, tmp_path):
    """A batch with heterogeneous image shapes can't use device resize;
    the fallback must reuse the already-decoded arrays (no double file
    read) and produce the same reports as the host-preprocess path."""
    import cv2

    gen, paths = setup
    p2 = str(tmp_path / "other_shape.png")
    cv2.imwrite(p2, (np.random.default_rng(9).uniform(0, 255, (700, 640))
                     ).astype(np.uint8))
    mixed = [paths[0], p2]
    kwargs = dict(batch_size=2, num_beams=1, max_length=6,
                  kv_cache_dtype=None)
    a = [r for chunk in generate_reports_pipelined(
        gen, mixed, device_resize=True, **kwargs) for r in chunk]
    b = [r for chunk in generate_reports_pipelined(
        gen, mixed, device_resize=False, **kwargs) for r in chunk]
    assert len(a) == len(b) == 2
    for x, y in zip(a, b):
        assert x.report == y.report


def test_preprocess_raw_returns_arrays_on_fallback(setup, tmp_path):
    import cv2

    gen, paths = setup
    p2 = str(tmp_path / "odd.png")
    cv2.imwrite(p2, (np.random.default_rng(3).uniform(0, 255, (123, 77))
                     ).astype(np.uint8))
    raw, arrays = gen.preprocess_raw([paths[0], p2])
    assert raw is None
    assert len(arrays) == 2 and arrays[1].shape == (123, 77)
    # same-shape batch: fast path active, no arrays returned
    raw2, arrays2 = gen.preprocess_raw([paths[0], paths[1]])
    assert raw2 is not None and arrays2 is None


@pytest.mark.parametrize("num_beams,cascade", [(1, False), (1, True),
                                               (3, True)])
def test_speculative_decode_matches_synchronous(setup, num_beams, cascade):
    """The speculative classifier-driven path (fused detect+decode at a
    predicted budget, validation readback off the critical path) must be
    report-identical to the synchronous split path — including when the
    prediction MISSES (initial_budget=8 forces batch 0 to speculate at the
    ladder floor, well under 2 images' typical selection count, so the
    miss re-decode is genuinely exercised)."""
    import dataclasses

    from rgrg_tpu.core.config import GenerationConfig
    from tests.test_full_model import SMOKE_CFG as _SMOKE

    gen, paths = setup
    if cascade:
        cfg2 = dataclasses.replace(
            _SMOKE, generation=GenerationConfig(length_buckets=(4, 12)))
        gen2 = ReportGenerator(gen.params, GPT2Tokenizer.dummy(), cfg=cfg2,
                               similarity_fn=None)
    else:
        gen2 = gen
    # batch_size 4: the tiny model detects ~3 regions/image, so the first
    # batch selects ~12 rows — above the ladder-floor initial_budget of 8,
    # forcing a real budget miss on the speculative first batch
    kwargs = dict(batch_size=4, num_beams=num_beams, max_length=12,
                  kv_cache_dtype=None, length_bucket_cascade=cascade)
    sync = [r for chunk in generate_reports_pipelined(
        gen2, paths, speculative_decode=False, **kwargs) for r in chunk]
    first_batch_sel = sum(int(r.selected_regions.sum()) for r in sync[:4])
    assert first_batch_sel > 8, \
        f"fixture too sparse to force a budget miss ({first_batch_sel})"
    for init in (None, 8):
        spec = [r for chunk in generate_reports_pipelined(
            gen2, paths, speculative_decode=True, initial_budget=init,
            **kwargs) for r in chunk]
        assert len(spec) == len(sync) == 5
        for a, b in zip(spec, sync):
            assert a.report == b.report
            assert a.region_sentences == b.region_sentences
            np.testing.assert_array_equal(a.selected_regions,
                                          b.selected_regions)
            np.testing.assert_array_equal(a.class_detected, b.class_detected)


def test_cascade_bailout_on_low_closure(setup):
    """Adaptive cascade bail-out (VERDICT r4 #4): when observed rung-1
    closure is below the threshold, the serving loop must skip the ladder
    for subsequent batches — the cascade's measured worst case is 1.37x
    SLOWER than a single full-length decode
    (docs/artifacts/beam_eval_cascade.json). Zero closure is forced
    deterministically: the EOS row of wte is zeroed, so its (tied-lm-head)
    logit is exactly 0 while every other token's is noise — argmax never
    picks EOS, no row ever finishes inside a bucket."""
    import dataclasses

    import jax.numpy as jnp

    from rgrg_tpu.core.config import GenerationConfig
    from rgrg_tpu.serving import CascadeStats
    from tests.test_full_model import SMOKE_CFG as _SMOKE

    gen, paths = setup
    params = jax.tree.map(lambda x: x, gen.params)  # shallow pytree copy
    dec = dict(params["decoder"])
    eos = _SMOKE.decoder.eos_token_id
    dec["wte"] = {"embedding": jnp.asarray(
        np.asarray(dec["wte"]["embedding"]).copy()).at[eos].set(0.0)}
    params = dict(params)
    params["decoder"] = dec

    cfg2 = dataclasses.replace(
        _SMOKE, generation=GenerationConfig(length_buckets=(4, 12)))
    gen2 = ReportGenerator(params, GPT2Tokenizer.dummy(), cfg=cfg2,
                           similarity_fn=None)
    kwargs = dict(batch_size=2, num_beams=1, max_length=12,
                  kv_cache_dtype=None)

    stats = CascadeStats(threshold=0.5, min_rows=1)
    casc = [r for chunk in generate_reports_pipelined(
        gen2, paths, length_bucket_cascade=True, cascade_stats=stats,
        **kwargs) for r in chunk]

    # batch 0 (synchronous seed) observed zero closure; every later batch
    # must have skipped the ladder
    assert stats.bailed_out
    assert stats.closure_rate() == 0.0
    assert stats.batches == 1
    assert stats.rows_selected > 0
    assert 4 in stats.rung_rows and 12 in stats.rung_rows
    # ...and bailing out never changes the reports
    full = [r for chunk in generate_reports_pipelined(
        gen2, paths, length_bucket_cascade=False, **kwargs) for r in chunk]
    assert len(casc) == len(full) == 5
    for a, b in zip(casc, full):
        assert a.report == b.report
        assert a.region_sentences == b.region_sentences

    # a zero threshold disables the policy: the ladder runs to the end
    stats_off = CascadeStats(threshold=0.0, min_rows=1)
    casc2 = [r for chunk in generate_reports_pipelined(
        gen2, paths, length_bucket_cascade=True, cascade_stats=stats_off,
        **kwargs) for r in chunk]
    assert not stats_off.bailed_out
    assert stats_off.batches == 3
    for a, b in zip(casc2, full):
        assert a.report == b.report
