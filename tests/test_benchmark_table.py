"""Benchmark-runner surface: latency honesty annotations (VERDICT r3 weak
#4) and the README table formatting around them."""
import numpy as np

from review_recommender_tpu.evals.benchmark import (
    format_results_table,
    measure_rpc_floor,
    run_performance_benchmark,
)


def _fake_search(query, **cfg):
    return ["S1", "S2", "S3"]


QUERIES = [{"query": "q1", "relevant_skus": {"S1"}},
           {"query": "q2", "relevant_skus": {"S2"}}]
CONFIGS = {"MethodA": {}, "MethodB": {}}


def test_rpc_floor_annotations():
    res = run_performance_benchmark(_fake_search, QUERIES,
                                    method_configs=CONFIGS,
                                    rpc_floor_ms=28.0)
    for m in CONFIGS:
        lat = res[m]["latency"]
        assert lat["rpc_floor_ms"] == 28.0
        assert lat["engine_p50_ms"] == max(0.0, lat["p50_ms"] - 28.0)
    table = format_results_table(res)
    assert "engine-side p50" in table
    assert "28.0 ms" in table and "round trip" in table


def test_no_floor_no_annotation():
    res = run_performance_benchmark(_fake_search, QUERIES,
                                    method_configs=CONFIGS)
    assert "engine_p50_ms" not in res["MethodA"]["latency"]
    table = format_results_table(res)
    assert "engine-side p50" not in table
    assert "| QPS |" in table


def test_measure_rpc_floor_returns_ms():
    ms = measure_rpc_floor(n=3)
    assert np.isfinite(ms) and ms >= 0.0
