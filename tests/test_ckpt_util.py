"""Checkpoint path/md5 utility (ref functions/ckpt_util.py:5-72, minus the
download — zero-egress)."""

import hashlib
import os

import pytest

from dpm_solver_tpu.utils.ckpt_util import (
    CKPT_MAP,
    MD5_MAP,
    URL_MAP,
    get_ckpt_path,
    md5_hash,
)


def test_tables_are_consistent():
    assert set(URL_MAP) == set(CKPT_MAP) == set(MD5_MAP)
    assert "ema_cifar10" in URL_MAP


def test_resolves_and_checks(tmp_path):
    payload = b"not a real checkpoint"
    p = tmp_path / CKPT_MAP["cifar10"]
    os.makedirs(p.parent, exist_ok=True)
    p.write_bytes(payload)

    got = get_ckpt_path("cifar10", root=str(tmp_path))
    assert got == str(p)
    assert md5_hash(got) == hashlib.md5(payload).hexdigest()
    with pytest.raises(ValueError, match="md5"):
        get_ckpt_path("cifar10", root=str(tmp_path), check=True)


def test_missing_file_reports_source_url(tmp_path):
    with pytest.raises(FileNotFoundError, match="heibox"):
        get_ckpt_path("lsun_bedroom", root=str(tmp_path))


def test_church_outdoor_aliases_to_church(tmp_path):
    p = tmp_path / CKPT_MAP["lsun_church"]
    os.makedirs(p.parent, exist_ok=True)
    p.write_bytes(b"x")
    assert get_ckpt_path("lsun_church_outdoor", root=str(tmp_path)) == str(p)


def test_unknown_name():
    with pytest.raises(KeyError):
        get_ckpt_path("nope")
