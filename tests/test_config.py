"""Config system tests (parity: /root/reference/tests/test_config.py)."""
import importlib
import os

import pytest as _pytest


def test_new_round1_knobs_defaults():
    from review_recommender_tpu.config import Config

    assert Config.EMB_MODEL_DIR == ""
    assert Config.RERANK_MODEL_DIR == ""
    assert Config.EMB_DTYPE in ("bfloat16", "float32", "float16", "int8")


def test_int8_dtype_validates(monkeypatch):
    from review_recommender_tpu.config import Config

    monkeypatch.setattr(Config, "EMB_DTYPE", "int8")
    Config.validate()
    monkeypatch.setattr(Config, "EMB_DTYPE", "int4")
    with _pytest.raises(ValueError):
        Config.validate()

import pytest


def _fresh_config(monkeypatch, **env):
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    cfg_mod = importlib.import_module("review_recommender_tpu.config")
    return importlib.reload(cfg_mod)


def test_defaults():
    from review_recommender_tpu.config import Config

    assert Config.DEFAULT_K == 10
    assert Config.DEFAULT_RERANK_K == 50
    assert Config.DEFAULT_W_DENSE == pytest.approx(0.55)
    assert Config.DEFAULT_GATE_PENALTY == pytest.approx(0.5)
    assert Config.DEFAULT_POOL_SIZE == 150
    assert Config.EMB_MODEL == "BAAI/bge-small-en-v1.5"


def test_env_override(monkeypatch):
    mod = _fresh_config(monkeypatch, DEFAULT_K="25", ENABLE_BM25="false",
                        EMB_DTYPE="float32")
    try:
        assert mod.Config.DEFAULT_K == 25
        assert mod.Config.ENABLE_BM25 is False
        assert mod.Config.EMB_DTYPE == "float32"
    finally:
        monkeypatch.undo()
        importlib.reload(mod)


def test_boolean_parsing(monkeypatch):
    mod = _fresh_config(monkeypatch, ENABLE_SNIPPETS="TRUE")
    try:
        assert mod.Config.ENABLE_SNIPPETS is True
    finally:
        monkeypatch.undo()
        importlib.reload(mod)


def test_environment_predicates(monkeypatch):
    mod = _fresh_config(monkeypatch, ENVIRONMENT="production")
    try:
        assert mod.Config.is_production()
        assert not mod.Config.is_development()
    finally:
        monkeypatch.undo()
        importlib.reload(mod)


def test_validate_rejects_bad_gate_mode(monkeypatch, tmp_path):
    mod = _fresh_config(monkeypatch, GATE_MODE="nonsense",
                        LOG_FILE=str(tmp_path / "app.log"))
    try:
        with pytest.raises(ValueError):
            mod.Config.validate()
    finally:
        monkeypatch.undo()
        importlib.reload(mod)


def test_validate_creates_log_dir(monkeypatch, tmp_path):
    log = tmp_path / "deep" / "logs" / "app.log"
    mod = _fresh_config(monkeypatch, LOG_FILE=str(log))
    try:
        mod.Config.validate()
        assert log.parent.exists()
    finally:
        monkeypatch.undo()
        importlib.reload(mod)


def test_validate_fails_missing_index_in_production(monkeypatch, tmp_path):
    mod = _fresh_config(
        monkeypatch,
        ENVIRONMENT="production",
        INDEX_DIR=str(tmp_path / "nope"),
        LOG_FILE=str(tmp_path / "app.log"),
    )
    try:
        with pytest.raises(FileNotFoundError):
            mod.Config.validate()
    finally:
        monkeypatch.undo()
        importlib.reload(mod)
