"""Command-line entry: `fourier-tpu setup|run` (reference src/cli.rs + main.rs).

Flag names, defaults, and validation mirror the reference exactly:
RunArgs (cli.rs:17-46), SetupArgs (cli.rs:48-88), SetupArgs::can_proceed
(cli.rs:90-123); `run` starts the RPC server, `setup` generates and saves
an SRS + precompute (main.rs:12-21).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

from ..models.piano import PianoBackend, SetupConfig


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--scale", type=int, default=20)
    p.add_argument("--machines-scale", type=int, default=1)
    p.add_argument("--uncompressed", action="store_true", default=False)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="fourier-tpu", description="Fourier RPC server (TPU-native)"
    )
    sub = parser.add_subparsers(dest="command", required=True)

    run = sub.add_parser("run", help="start the RPC server")
    run.add_argument("--setup-path", default=None)
    run.add_argument("--precompute-path", default=None)
    _add_common(run)
    run.add_argument("--host", default="localhost")
    run.add_argument("--port", type=int, default=1337)

    setup = sub.add_parser("setup", help="generate/convert setup files")
    setup.add_argument("--setup-path", default="data/setup")
    setup.add_argument("--precompute-path", default="data/precompute")
    _add_common(setup)
    setup.add_argument("--overwrite", action="store_true", default=False)
    setup.add_argument("--generate-setup", action="store_true", default=False)
    setup.add_argument("--generate-precompute", action="store_true", default=False)
    setup.add_argument("--decompress-existing", action="store_true", default=False)
    setup.add_argument("--compress-existing", action="store_true", default=False)
    return parser


def can_proceed(args) -> bool:
    """SetupArgs::can_proceed (reference src/cli.rs:90-123)."""
    log = logging.getLogger("fourier_tpu")
    if os.path.exists(args.setup_path) and args.generate_setup and not args.overwrite:
        log.error(
            "File %s already exists, use --overwrite to overwrite", args.setup_path
        )
        return False
    if (
        os.path.exists(args.precompute_path)
        and args.generate_precompute
        and not args.overwrite
    ):
        log.error(
            "File %s already exists, use --overwrite to overwrite",
            args.precompute_path,
        )
        return False
    if args.compress_existing and args.decompress_existing:
        log.error("Cannot compress and decompress at the same time, choose one")
        return False
    if args.compress_existing and not args.uncompressed:
        log.error("Cannot compress an already compressed file")
        return False
    if args.decompress_existing and args.uncompressed:
        log.error("Cannot decompress an already decompressed file")
        return False
    return True


def _setup_config_from_run(args) -> SetupConfig:
    """RunArgs -> config: an omitted path means generate fresh
    (reference src/engine/config.rs:174-200)."""
    return SetupConfig(
        scale=args.scale,
        machines_scale=args.machines_scale,
        setup_path=args.setup_path,
        precompute_path=args.precompute_path,
        compressed=not args.uncompressed,
        generate_setup=args.setup_path is None or not os.path.exists(args.setup_path),
        generate_precompute=args.precompute_path is None
        or not os.path.exists(args.precompute_path),
    )


def cmd_run(args) -> int:
    from .server import ServerConfig, start_rpc_server

    cfg = ServerConfig(
        host=args.host, port=args.port, backend=_setup_config_from_run(args)
    )
    start_rpc_server(cfg)
    return 0


def cmd_setup(args) -> int:
    if not can_proceed(args):
        return 1
    if args.compress_existing or args.decompress_existing:
        return _convert_compression(args)
    cfg = SetupConfig(
        scale=args.scale,
        machines_scale=args.machines_scale,
        setup_path=args.setup_path,
        precompute_path=args.precompute_path,
        compressed=not args.uncompressed,
        generate_setup=args.generate_setup or not os.path.exists(args.setup_path),
        generate_precompute=args.generate_precompute
        or not os.path.exists(args.precompute_path),
    )
    PianoBackend.setup_and_save(cfg)
    return 0


def _convert_compression(args) -> int:
    """compressed <-> uncompressed setup-file migration.

    First-class here, unlike the reference where the live Piano path never
    implemented it (only the dead BlstBackend did, reference
    src/engine/blst.rs:257-288; SURVEY.md L2' note).

    Only the setup file needs migrating: precompute tables are stored as
    `.npz` (a documented divergence from the reference's raw byte format,
    see runtime/io.py), and `.npz` carries no compressed/uncompressed
    point-encoding distinction — the same file serves both modes."""
    from . import io as rio

    # decompress: file is compressed -> write uncompressed; compress: reverse
    src_compressed = bool(args.decompress_existing)
    settings = rio.load_setup(args.setup_path, compressed=src_compressed)
    rio.save_setup(settings, args.setup_path, compressed=not src_compressed)
    return 0


def main(argv=None) -> int:
    # RUST_LOG honored for drop-in parity with the reference's env filter
    # (reference src/main.rs:25-28; the Python e2e sets RUST_LOG=debug).
    level_str = os.environ.get("FOURIER_LOG") or os.environ.get("RUST_LOG") or "info"
    level = getattr(logging, level_str.split(",")[0].upper(), logging.INFO)
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    # Persistent XLA compilation cache: server restarts and repeated CLI
    # invocations skip recompiling the limb kernels.
    try:
        import jax

        # Some accelerator plugins ignore JAX_PLATFORMS; honor an explicit
        # platform override at config level (tests set FOURIER_PLATFORM=cpu
        # so spawned servers never grab TPU hardware).
        if os.environ.get("FOURIER_PLATFORM"):
            jax.config.update("jax_platforms", os.environ["FOURIER_PLATFORM"])

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "FOURIER_XLA_CACHE", os.path.expanduser("~/.cache/fourier_tpu_xla")
            ),
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is an optimization, never fatal
        pass
    args = build_parser().parse_args(argv)
    if args.command == "run":
        return cmd_run(args)
    return cmd_setup(args)


if __name__ == "__main__":
    sys.exit(main())
