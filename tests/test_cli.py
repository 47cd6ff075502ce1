"""CLI behavior: flag validation and compressed<->uncompressed migration
(reference SetupArgs::can_proceed, src/cli.rs:90-123; the migration is a
first-class live feature here, unlike the reference where only the dead
BlstBackend implemented it — SURVEY.md L2')."""

import argparse
import os

from fourier_tpu.models.piano import PianoFFTSettings, generate_trusted_setup
from fourier_tpu.runtime import io as rio
from fourier_tpu.runtime.cli import build_parser, can_proceed


def _setup_args(**overrides):
    ns = build_parser().parse_args(["setup"])
    for k, v in overrides.items():
        setattr(ns, k, v)
    return ns


def test_can_proceed_rules(tmp_path):
    existing = tmp_path / "exists"
    existing.write_bytes(b"x")

    # overwrite guard
    args = _setup_args(setup_path=str(existing), generate_setup=True)
    assert not can_proceed(args)
    args.overwrite = True
    assert can_proceed(args)

    # compress/decompress mutual exclusion
    args = _setup_args(compress_existing=True, decompress_existing=True)
    assert not can_proceed(args)
    # cannot compress an already-compressed file
    args = _setup_args(compress_existing=True, uncompressed=False)
    assert not can_proceed(args)
    # cannot decompress an already-decompressed file
    args = _setup_args(decompress_existing=True, uncompressed=True)
    assert not can_proceed(args)


def test_compression_migration(tmp_path, rng):
    from fourier_tpu.runtime.cli import _convert_compression

    fft = PianoFFTSettings(4, 1)
    settings = generate_trusted_setup(fft, (b"\x0c" * 32, b"\x0d" * 32))
    path = str(tmp_path / "setup")
    rio.save_setup(settings, path, compressed=True)
    size_compressed = os.path.getsize(path)

    # decompress in place
    args = _setup_args(setup_path=path, decompress_existing=True)
    assert _convert_compression(args) == 0
    assert os.path.getsize(path) > size_compressed
    loaded = rio.load_setup(path, compressed=False)
    assert loaded.g == settings.g
    assert loaded.g2_tau_y == settings.g2_tau_y

    # compress back
    args = _setup_args(setup_path=path, uncompressed=True, compress_existing=True)
    assert _convert_compression(args) == 0
    assert os.path.getsize(path) == size_compressed
    loaded = rio.load_setup(path, compressed=True)
    assert loaded.g2_tau_x == settings.g2_tau_x
