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


def test_env_file_loading(monkeypatch, tmp_path):
    """`.env` in cwd loads at config import (reference config.py:11-16);
    process env vars win over file values."""
    import os

    (tmp_path / ".env").write_text(
        "# comment line\n"
        "DEFAULT_K=33\n"
        'APP_TITLE="From Env File"\n'
        "LOG_LEVEL=debug\n"
    )
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("LOG_LEVEL", "WARNING")  # process env beats the file
    mod = _fresh_config(monkeypatch)
    try:
        assert mod.Config.DEFAULT_K == 33
        assert mod.Config.APP_TITLE == "From Env File"
        assert mod.Config.LOG_LEVEL == "WARNING"
    finally:
        for k in ("DEFAULT_K", "APP_TITLE"):
            os.environ.pop(k, None)
        monkeypatch.undo()
        importlib.reload(mod)


def test_env_file_inline_comments(monkeypatch, tmp_path):
    """Unquoted values strip inline ' # ...' comments (dotenv semantics).
    Regression: .env.example annotates nearly every line inline, so
    `cp .env.example .env` must not crash _env_int at config import or
    corrupt values like GATE_MODE."""
    import os

    (tmp_path / ".env").write_text(
        "DEFAULT_K=33         # padded unique terms per doc\n"
        "GATE_MODE=device          # device | host\n"
        'APP_TITLE="quoted # not a comment"\n'
        "LOG_FORMAT=%(message)s#kept   # hash without space-before is kept\n"
    )
    monkeypatch.chdir(tmp_path)
    mod = _fresh_config(monkeypatch)
    try:
        assert mod.Config.DEFAULT_K == 33
        assert mod.Config.GATE_MODE == "device"
        assert mod.Config.APP_TITLE == "quoted # not a comment"
        assert mod.Config.LOG_FORMAT == "%(message)s#kept"
        mod.Config.validate()
    finally:
        for k in ("DEFAULT_K", "GATE_MODE", "APP_TITLE", "LOG_FORMAT"):
            os.environ.pop(k, None)
        monkeypatch.undo()
        importlib.reload(mod)


def test_env_example_template_is_loadable(monkeypatch, tmp_path):
    """The SHIPPED .env.example must survive being copied to .env verbatim
    (the standard setup step DEPLOYMENT.md implies)."""
    import os
    import shutil
    from pathlib import Path

    src = Path(__file__).resolve().parent.parent / ".env.example"
    keys = [
        ln.split("=", 1)[0] for ln in src.read_text().splitlines()
        if ln.strip() and not ln.strip().startswith("#") and "=" in ln
    ]
    shutil.copy(src, tmp_path / ".env")
    monkeypatch.chdir(tmp_path)
    mod = _fresh_config(monkeypatch)  # would raise on int('512  # ...')
    try:
        assert mod.Config.GATE_MODE in ("device", "host")
        assert mod.Config.EMB_DTYPE in (
            "bfloat16", "float32", "float16", "int8")
        mod.Config.validate()
    finally:
        for k in keys:
            os.environ.pop(k, None)
        monkeypatch.undo()
        importlib.reload(mod)


def test_env_file_layering(monkeypatch, tmp_path):
    """`.env.<ENVIRONMENT>` layers on top of `.env` when ENVIRONMENT names
    one (the reference ships .env / .env.production side by side)."""
    import os

    (tmp_path / ".env").write_text("ENVIRONMENT=production\nDEFAULT_K=7\n")
    (tmp_path / ".env.production").write_text(
        "APP_PORT=9000\nDEFAULT_K=19\n"
    )
    monkeypatch.chdir(tmp_path)
    mod = _fresh_config(monkeypatch)
    try:
        assert mod.Config.ENVIRONMENT == "production"
        assert mod.Config.APP_PORT == 9000
        # .env loaded first and is not overridden by the layered file
        assert mod.Config.DEFAULT_K == 7
    finally:
        for k in ("ENVIRONMENT", "DEFAULT_K", "APP_PORT"):
            os.environ.pop(k, None)
        monkeypatch.undo()
        importlib.reload(mod)
