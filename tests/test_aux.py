"""Aux subsystem tests: latency predictor, experiments grid, log scrapers."""

import numpy as np
import pytest

from edgevisiontransformer_tpu.bench.experiments import (
    fusion_test_transformer_stages,
    prune_benchmark_grid,
)
from edgevisiontransformer_tpu.utils.latency_model import (
    _SIZE_SHAPES,
    LatencyPredictor,
    collect_latency_dataset,
    format_features,
    lat_metrics,
    parse_features,
    physical_features,
    sample_random_configs,
)
from edgevisiontransformer_tpu.utils.logscrape import (
    fetch_accuracies_from_log,
    fetch_latency_std,
    fetch_results_from_markers,
)


def test_feature_dsl_roundtrip():
    enc = "h_4_d_0.4-h_2_d_0.3"
    assert parse_features(enc) == [4.0, 0.4, 2.0, 0.3]
    assert format_features([4, 2], [0.4, 0.3]) == enc


def test_lat_metrics():
    rmse, rmspe, rel, a5, a10, a15 = lat_metrics([1.0, 2.0], [1.0, 2.1])
    assert rmse == pytest.approx(np.sqrt(0.01 / 2))
    assert a5 == 1.0  # both within 5%


def test_latency_predictor_learns_linear_relation():
    # synthetic: latency = sum of per-layer (h * 1.0 + d * 2.0)
    encs = sample_random_configs(200, depth=4, max_heads=6, seed=1)
    ys = [sum(parse_features(e)[0::2]) + 2 * sum(parse_features(e)[1::2])
          for e in encs]
    m = LatencyPredictor(n_estimators=50)
    metrics = m.fit(encs, ys)
    assert metrics is not None
    rmse, rmspe, rel, a5, a10, a15 = metrics
    assert a15 > 0.7  # RF should capture an additive relation decently
    pred = m.predict(encs[0])
    assert abs(pred - ys[0]) / ys[0] < 0.3


def test_latency_predictor_save_load(tmp_path):
    encs = sample_random_configs(30, depth=2, max_heads=3)
    ys = [float(i) + 1 for i in range(30)]
    m = LatencyPredictor(n_estimators=10)
    m.fit(encs, ys, test_size=0)
    p = str(tmp_path / "lat.pkl")
    m.save(p)
    m2 = LatencyPredictor.load(p)
    assert m2.predict(encs[0]) == pytest.approx(m.predict(encs[0]))


def test_size_shapes_in_sync_with_vit():
    # the physical featurizer's (dim, mlp_dim) table must track the model
    # library's canonical DeiT shapes (latency_model._SIZE_SHAPES docstring)
    from edgevisiontransformer_tpu.models.vit import _DEIT_SHAPES

    for size, (dim, mlp) in _SIZE_SHAPES.items():
        shape = _DEIT_SHAPES[size]
        assert (dim, mlp) == (shape["dim"], shape["mlp_dim"]), size


def test_physical_features_sanity():
    uniform = format_features([3] * 12, [1.0] * 12)
    f = physical_features(uniform, "tiny")
    assert len(f) == 10
    assert f[5] == 1.0  # uniform config -> one segmented-kernel run
    # alternating heads -> a segment boundary at every layer
    alt = format_features([1, 3] * 6, [1.0] * 12)
    assert physical_features(alt, "tiny")[5] == 12.0
    # more heads -> strictly more attention MACs and weight bytes
    bigger = format_features([3] * 12, [1.0] * 12)
    smaller = format_features([1] * 12, [1.0] * 12)
    fb, fs = (physical_features(e, "tiny") for e in (bigger, smaller))
    assert fb[0] > fs[0] and fb[3] > fs[3]
    # base at full density crosses the 12 MB weights-resident gate per layer
    full_base = format_features([12] * 12, [1.0] * 12)
    assert physical_features(full_base, "base")[8] == 12.0


def test_latency_predictor_batch_feature(tmp_path):
    """Serving-batch extension: one fit over pooled b1+b32 rows (the r4
    verdict's missing batch dimension) — the predictor must separate the
    two batches for the same config, round-trip through save/load, and
    refuse the batch feature on the reference-parity raw featurization."""
    encs = sample_random_configs(30, depth=12, max_heads=3, seed=3)
    # synthetic: ms = (0.1 + 0.01*sum_h) * batch-ish scaling
    base = [0.1 + 0.01 * sum(parse_features(e)[0::2]) for e in encs]
    all_encs = encs + encs
    batches = [1] * 30 + [32] * 30
    ys = base + [20 * b for b in base]
    m = LatencyPredictor(features="physical", size="tiny",
                         batch_feature=True, n_estimators=30)
    m.fit(all_encs, ys, test_size=0, batches=batches)
    p1 = m.predict(encs[0], batch=1)
    p32 = m.predict(encs[0], batch=32)
    assert p32 > 5 * p1, (p1, p32)
    path = str(tmp_path / "lat_b.pkl")
    m.save(path)
    m2 = LatencyPredictor.load(path)
    assert m2.batch_feature
    assert m2.predict(encs[0], batch=32) == pytest.approx(p32)
    # feature vector grows by exactly (batch, batch*total_macs)
    assert len(physical_features(encs[0], "tiny", batch=32)) == 12
    with pytest.raises(ValueError):
        LatencyPredictor(features="raw", batch_feature=True)


def test_latency_predictor_physical_save_load(tmp_path):
    encs = sample_random_configs(30, depth=12, max_heads=3)
    ys = [1.0 + 0.1 * sum(parse_features(e)[0::2]) for e in encs]
    m = LatencyPredictor(features="physical", size="tiny", n_estimators=10)
    m.fit(encs, ys, test_size=0)
    p = str(tmp_path / "lat_phys.pkl")
    m.save(p)
    m2 = LatencyPredictor.load(p)
    assert m2.features == "physical" and m2.size == "tiny"
    assert m2.predict(encs[0]) == pytest.approx(m.predict(encs[0]))
    # legacy pickles (bare sklearn model) load as raw-feature predictors
    import pickle

    raw = LatencyPredictor(n_estimators=5)
    raw.fit(encs, ys, test_size=0)
    legacy = str(tmp_path / "legacy.pkl")
    with open(legacy, "wb") as f:
        pickle.dump(raw.model, f)
    m3 = LatencyPredictor.load(legacy)
    assert m3.features == "raw"
    assert m3.predict(encs[0]) == pytest.approx(raw.predict(encs[0]))


def test_latency_predictor_physical_needs_valid_size():
    with pytest.raises(ValueError):
        LatencyPredictor(features="physical")
    with pytest.raises(ValueError):
        LatencyPredictor(features="bogus")


def test_cli_fit_rejects_wrong_size(tmp_path):
    # --features physical --size tiny on a dataset with 6-head configs
    # must fail loudly (cli.py fit guard)
    from edgevisiontransformer_tpu.cli import cmd_latency_model

    csv_path = tmp_path / "d.csv"
    rows = ["encoding,ms,std_ms,iters"]
    encs = sample_random_configs(5, depth=12, max_heads=6, seed=3)
    encs.append(format_features([6] * 12, [1.0] * 12))  # ensure a 6-head row
    for e in encs:
        rows.append(f"{e},0.5,0.001,100")
    csv_path.write_text("\n".join(rows) + "\n")
    with pytest.raises(SystemExit):
        cmd_latency_model(["fit", "--data", str(csv_path), "--size", "tiny",
                           "--features", "physical",
                           "--output", str(tmp_path / "m.pkl")])


def test_collect_latency_dataset():
    xs, ys = collect_latency_dataset(["h_1_d_1.0"], lambda e: 42.0, log=lambda s: None)
    assert ys == [42.0]


def test_prune_benchmark_grid():
    grid = prune_benchmark_grid("tiny")
    assert "all_head3_ffn0.9" in grid
    assert "all_head1_ffn1.0" in grid
    assert "all_head2_ffn0.7" in grid
    assert len(grid) == 9 + 3 + 4
    grid_s = prune_benchmark_grid("small")
    assert "all_head5_ffn0.6" in grid_s


def test_fusion_stages_equal_output():
    import jax, jax.numpy as jnp

    stages = fusion_test_transformer_stages(dim=32, mlp=64)
    x = jax.random.normal(jax.random.key(0), (8, 32))
    a = stages(x, False)
    b = stages(x, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_log_scrapers(tmp_path):
    log = tmp_path / "bench.log"
    log.write_text(
        "noise\nAvg latency 12.500 ms, Std 0.300 ms\n"
        "Mem footprint(MB): 26.66\n"
        "top1 0.7221\n"
        "Avg latency 7.1 ms, Std 0.1 ms\n"
    )
    assert fetch_latency_std(str(log)) == [(12.5, 0.3), (7.1, 0.1)]
    assert fetch_accuracies_from_log(str(log)) == [0.7221]

    d = tmp_path / "m" / "deit_t_prune14"
    d.mkdir(parents=True)
    (d / "accuracy7221.txt").touch()
    res = fetch_results_from_markers(str(tmp_path / "m"))
    assert res == {"deit_t_prune14": 0.7221}


def test_plots(tmp_path):
    from edgevisiontransformer_tpu.utils.plots import (
        MODEL_INFO,
        draw_latency_vs_macs,
        draw_macs_accuracy_curve,
    )

    assert MODEL_INFO["deit_tiny"].acc == 72.2
    p1 = draw_macs_accuracy_curve(str(tmp_path / "a.png"),
                                  extra_points={"ours": (1.28, 72.0)})
    p2 = draw_latency_vs_macs({"deit_tiny": (1.28, 0.08)}, str(tmp_path / "b.png"))
    import os

    assert os.path.getsize(p1) > 1000 and os.path.getsize(p2) > 1000


def test_micro_models_build_and_run():
    import jax

    from edgevisiontransformer_tpu.bench.experiments import (
        micro_attention,
        micro_dense_plus_input,
        micro_ffn,
    )

    for builder in (micro_attention, micro_ffn, micro_dense_plus_input):
        fn, args = builder()
        y = jax.jit(fn)(*args)
        assert y.shape[0] == 1 and y.ndim == 3


def test_metrics_logger(tmp_path):
    from edgevisiontransformer_tpu.utils.metrics import MetricsLogger, read_metrics

    p = str(tmp_path / "m.jsonl")
    ml = MetricsLogger(p, echo=False)
    ml.log("train_step", step=1, loss=0.5)
    ml.log("eval", top1=0.72)
    ml.close()
    recs = read_metrics(p)
    assert recs[0]["event"] == "train_step" and recs[0]["loss"] == 0.5
    assert recs[1]["top1"] == 0.72


def test_looptimer_chaining_on_cpu():
    """The loop-delta runner must actually execute n iterations (validated by
    a side-effect-free but value-visible chain: out grows with n)."""
    import jax
    import jax.numpy as jnp

    from edgevisiontransformer_tpu.bench.looptimer import _chained_runner

    calls = []

    def fn(x):
        return x * 1.0000001  # value drifts per iteration through the chain

    run = _chained_runner(fn, (jnp.ones((8, 8)),), chain_arg=0)
    v1 = float(run(1))
    v100 = float(run(100))
    # chaining adds tiny ticks, values must differ slightly but stay finite
    assert np.isfinite(v1) and np.isfinite(v100)


def test_benchmark_fn_loopdelta_contract():
    """harness.benchmark_fn must ride the loop-delta core (per-dispatch wall
    timing is unsound on the tunneled runtime) and report the reference's
    stat contract incl. memory fields."""
    import jax.numpy as jnp

    from edgevisiontransformer_tpu.bench import BenchResult, benchmark_fn

    r = benchmark_fn(
        lambda x: x @ x, (jnp.ones((64, 64)),), name="m64",
        num_runs=2, warmup_runs=1, iters=5, chain_arg=0, batch_size=4,
    )
    assert isinstance(r, BenchResult)
    assert r.avg_ms >= 0 and r.min_ms <= r.p50_ms <= r.max_ms
    assert r.iters >= 5  # auto-raised chain length recorded
    assert r.init_ms > 0 and r.first_ms > 0
    assert r.throughput_per_s is None or r.throughput_per_s > 0
    assert "Mem footprint(MB)" in r.summary()
    import json

    assert json.loads(r.to_json())["name"] == "m64"


def test_measure_op_time_returns_stats():
    import jax.numpy as jnp

    from edgevisiontransformer_tpu.bench.looptimer import measure_op_time

    r = measure_op_time(lambda x: x @ x, (jnp.ones((64, 64)),), iters=5,
                        repeats=2, chain_arg=0)
    assert set(r) >= {"avg_ms", "p50_ms", "min_ms", "std_ms"}
    assert r["avg_ms"] >= 0
