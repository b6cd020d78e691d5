"""Tuned LIBTPU_INIT_ARGS plumbing (tpu_flags.py)."""

from uda_aerial_semantic_segmentation_research_tpu.tpu_flags import (
    TUNED_LIBTPU_FLAGS,
    apply_tuned_tpu_flags,
)


def test_appends_when_unset():
    env = {}
    merged = apply_tuned_tpu_flags(env)
    assert env["LIBTPU_INIT_ARGS"] == merged
    for flag, value in TUNED_LIBTPU_FLAGS.items():
        assert f"{flag}={value}" in merged


def test_user_value_wins():
    env = {"LIBTPU_INIT_ARGS":
           "--xla_tpu_scoped_vmem_limit_kib=12345 --other=1"}
    merged = apply_tuned_tpu_flags(env)
    assert "--xla_tpu_scoped_vmem_limit_kib=12345" in merged
    assert "57344" not in merged
    assert "--other=1" in merged


def test_appends_missing_next_to_user_flags():
    env = {"LIBTPU_INIT_ARGS": "--unrelated=x"}
    merged = apply_tuned_tpu_flags(env)
    assert merged.startswith("--unrelated=x ")
    assert "--xla_tpu_scoped_vmem_limit_kib=57344" in merged


def test_opt_out():
    env = {"UDA_TPU_NO_TUNED_FLAGS": "1"}
    assert apply_tuned_tpu_flags(env) == ""
    assert "LIBTPU_INIT_ARGS" not in env


def test_package_import_applies(monkeypatch):
    """The package __init__ calls apply_tuned_tpu_flags at import, so
    every CLI entry point inherits the tuned defaults."""
    import importlib
    import os

    monkeypatch.delenv("LIBTPU_INIT_ARGS", raising=False)
    import uda_aerial_semantic_segmentation_research_tpu as pkg

    importlib.reload(pkg)
    assert "--xla_tpu_scoped_vmem_limit_kib" in os.environ.get(
        "LIBTPU_INIT_ARGS", "")


def test_idempotent():
    env = {}
    first = apply_tuned_tpu_flags(env)
    second = apply_tuned_tpu_flags(env)
    assert first == second
