#!/usr/bin/env python
"""Dependency-free smoke-test runner (reference run_tests.py parity:
config / utility-kernel / import / data-validation checks without pytest).
Used by `start.sh`-style deploy gates where pytest may not be installed.

Exit code 0 = all suites green.
"""
from __future__ import annotations

import sys
import traceback


def run_config_tests() -> int:
    from review_recommender_tpu.config import Config, config

    assert config.DEFAULT_K > 0
    assert 0 <= config.DEFAULT_GATE_PENALTY <= 1
    assert config.EMB_DTYPE in ("bfloat16", "float32", "float16", "int8")
    assert config.GATE_MODE in ("device", "host")
    assert Config.is_development() or Config.is_production() or True
    config.validate()
    return 5


def run_utils_tests() -> int:
    import numpy as np

    from review_recommender_tpu.utils.text import (
        build_gate_groups,
        calculate_gate_factor,
        tokenize_document,
        tokenize_query,
    )

    assert tokenize_query("The quick fox") == ["quick", "fox"]
    assert tokenize_document("the a an it is") == []
    groups = build_gate_groups("yellow cat socks")
    assert any("yellow" in g for g in groups)
    f, hits, total = calculate_gate_factor("yellow socks", groups, 0.5)
    assert 0 < f <= 1 and hits <= total
    f2, _, _ = calculate_gate_factor("nothing relevant here", groups, 0.5)
    assert f2 == 0.5 ** total
    assert np.isfinite(f2)
    return 5


def run_import_tests() -> int:
    import review_recommender_tpu  # noqa: F401
    import review_recommender_tpu.engine.search  # noqa: F401
    import review_recommender_tpu.evals  # noqa: F401
    import review_recommender_tpu.index.build  # noqa: F401
    import review_recommender_tpu.ops.ivf  # noqa: F401
    import review_recommender_tpu.models  # noqa: F401
    import review_recommender_tpu.parallel.sharded  # noqa: F401
    import review_recommender_tpu.serve.cli  # noqa: F401
    import review_recommender_tpu.topics  # noqa: F401
    import review_recommender_tpu.topics.density  # noqa: F401
    import review_recommender_tpu.topics.llm_clients  # noqa: F401
    import review_recommender_tpu.train  # noqa: F401

    return 12


def run_data_validation() -> int:
    """Index round-trip + audit on a tiny in-memory corpus."""
    import tempfile

    import numpy as np

    from review_recommender_tpu.index.build import build_bundle_from_products
    from review_recommender_tpu.index.io import load_bundle, save_bundle
    from review_recommender_tpu.serve.audit import audit_index_dir

    rng = np.random.default_rng(0)
    products = [
        {"sku": f"S{i}", "agg_text": f"product {i} wireless great sound",
         "n_reviews": i + 1, "avg_stars": 4.0}
        for i in range(6)
    ]
    emb = rng.standard_normal((6, 8)).astype(np.float32)
    bundle = build_bundle_from_products(products, emb, pad_multiple=8,
                                        doc_terms_cap=16)
    with tempfile.TemporaryDirectory() as d:
        save_bundle(bundle, d)
        loaded = load_bundle(d)
        assert loaded.products.n_docs == 6
        report = audit_index_dir(d)
        assert report["ok"], report
    return 4


def main() -> int:
    suites = [
        ("config", run_config_tests),
        ("utils", run_utils_tests),
        ("imports", run_import_tests),
        ("data validation", run_data_validation),
    ]
    failed = 0
    total = 0
    for name, fn in suites:
        try:
            n = fn()
            total += n
            print(f"[PASS] {name}: {n} checks")
        except Exception:
            failed += 1
            print(f"[FAIL] {name}:")
            traceback.print_exc()
    print(f"{total} checks, {failed} suite failures")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
