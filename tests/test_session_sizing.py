"""auto_driver_mem sizing rules (r09 advisor finding: the 1.5 GB/core
heap must clamp to physical RAM or a many-core/low-RAM box requests
an unstartable JVM)."""

from __future__ import annotations

import os

from news_clustering_and_summarization_spark import session as S


def test_small_input_keeps_default(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_DRIVER_MEM", raising=False)
    (tmp_path / "small.parquet").write_bytes(b"x" * 1024)
    assert S.auto_driver_mem(str(tmp_path), cpus=32) == "8g"


def test_large_input_scales_with_cores(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_DRIVER_MEM", raising=False)
    with open(tmp_path / "big.parquet", "wb") as f:
        f.seek(200 * 1024 * 1024)
        f.write(b"\0")
    got = int(S.auto_driver_mem(str(tmp_path), cpus=32).rstrip("g"))
    # 1.5 GB/core, but never above 70% of physical RAM
    ram = S._physical_ram_gb()
    assert got >= 8
    if ram:
        assert got <= max(8, int(0.7 * ram))
    assert got <= 48


def test_ram_clamp_binds_on_low_ram_box(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_DRIVER_MEM", raising=False)
    with open(tmp_path / "big.parquet", "wb") as f:
        f.seek(200 * 1024 * 1024)
        f.write(b"\0")
    # simulate 32 cores / 16 GB RAM: unclamped would ask for 48g
    monkeypatch.setattr(S, "_physical_ram_gb", lambda: 16)
    got = S.auto_driver_mem(str(tmp_path), cpus=32)
    assert got == f"{max(8, int(0.7 * 16))}g"


def test_explicit_env_always_wins(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_DRIVER_MEM", "3g")
    assert S.auto_driver_mem(str(tmp_path), cpus=32) == "3g"
