"""CLI surface: compress/decompress/verify plus the admin commands."""

import numpy as np
import pytest

from lz4_sgori_tpu import cli, store as S


def test_compress_decompress_files(tmp_path, fixtures, capsys):
    src = tmp_path / "in.bin"
    src.write_bytes(fixtures["mixed"][:32768])
    dst = tmp_path / "out.lz4j"
    back = tmp_path / "back.bin"
    assert cli.main(["compress", str(src), str(dst),
                     "--block-size", "4096"]) == 0
    assert cli.main(["decompress", str(dst), str(back)]) == 0
    assert back.read_bytes() == src.read_bytes()
    out = capsys.readouterr().out
    assert "ratio" in out


def test_verify_sweep(tmp_path, fixtures, capsys):
    src = tmp_path / "in.bin"
    src.write_bytes(fixtures["text_large"])
    assert cli.main(["verify", str(src), "--block-sizes", "1", "4"]) == 0
    out = capsys.readouterr().out
    assert "bs=1k: ok" in out and "bs=4k: ok" in out


def test_admin_commands(tmp_path, capsys):
    backing = str(tmp_path / "ram0.img")
    assert cli.main(["map", backing, "--chunk-size", "1024",
                     "--capacity", "65536"]) == 0
    try:
        assert cli.main(["info"]) == 0
        assert "proxy over" in capsys.readouterr().out
        assert cli.main(["stats"]) == 0
        assert "write stats:" in capsys.readouterr().out
        assert cli.main(["stats", "--reset"]) == 0
    finally:
        assert cli.main(["unmap"]) == 0
