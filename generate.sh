#!/usr/bin/env bash
# Setup-file generator (reference generate.sh): wraps `fourier-tpu setup`.
# Env/flag parsing and the data/ filename scheme are preserved:
#   data/{setup,precompute}_{scale}_{machines_scale}.{compressed,uncompressed}
set -euo pipefail

SCALE="${SCALE:-6}"
MACHINES_SCALE="${MACHINES_SCALE:-2}"
UNCOMPRESSED="${UNCOMPRESSED:-0}"
OVERWRITE="${OVERWRITE:-0}"

usage() {
    echo "Usage: $0 [-s scale] [-m machines_scale] [-u] [-o]"
    echo "  -s scale            polynomial scale (default: $SCALE)"
    echo "  -m machines_scale   machine-count scale (default: $MACHINES_SCALE)"
    echo "  -u                  write uncompressed points"
    echo "  -o                  overwrite existing files"
    exit 1
}

while getopts "s:m:uoh" opt; do
    case "$opt" in
        s) SCALE="$OPTARG" ;;
        m) MACHINES_SCALE="$OPTARG" ;;
        u) UNCOMPRESSED=1 ;;
        o) OVERWRITE=1 ;;
        *) usage ;;
    esac
done

SUFFIX=compressed
EXTRA=()
if [ "$UNCOMPRESSED" = "1" ]; then
    SUFFIX=uncompressed
    EXTRA+=(--uncompressed)
fi
if [ "$OVERWRITE" = "1" ]; then
    EXTRA+=(--overwrite)
fi

mkdir -p data
SETUP_PATH="data/setup_${SCALE}_${MACHINES_SCALE}.${SUFFIX}"
PRECOMPUTE_PATH="data/precompute_${SCALE}_${MACHINES_SCALE}.${SUFFIX}"

exec python -m fourier_tpu setup \
    --setup-path "$SETUP_PATH" \
    --precompute-path "$PRECOMPUTE_PATH" \
    --scale "$SCALE" \
    --machines-scale "$MACHINES_SCALE" \
    --generate-setup \
    --generate-precompute \
    "${EXTRA[@]}"
