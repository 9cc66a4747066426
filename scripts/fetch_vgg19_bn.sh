#!/usr/bin/env bash
# Fetch torchvision's pretrained VGG-19-BN weights and convert them to
# the npz layout the visual loss loads (models/vgg.py).
#
# The reference's default objective trains with the VGG perceptual
# terms (lambda4=5, lambda5=50 — reference src/main.py:216-236 via
# src/loss.py:29-56), which need ImageNet-pretrained vgg19_bn features.
# This environment has no network and no torchvision, so the artifact
# cannot be produced here; on ANY internet-connected host this script
# closes the gap mechanically:
#
#     scripts/fetch_vgg19_bn.sh [outdir]     # default: ./
#     python -m shadow_removal_istd_tpu.cli.main ... \
#         --vgg-weights <outdir>/vgg19_bn.npz
#
# Integrity: torchvision weight files embed the first 8 hex chars of
# their SHA-256 in the filename; that prefix is hard-coded below and
# catches corruption/truncation. A 32-bit prefix is NOT a defense
# against a deliberately tampered mirror — for that, pass the full
# 64-char digest (knowable on any trusted host via
# `sha256sum vgg19_bn-c79401a0.pth`) in VGG19_BN_SHA256 and the script
# enforces it instead.
set -euo pipefail

OUTDIR="${1:-.}"
URL="https://download.pytorch.org/models/vgg19_bn-c79401a0.pth"
SHA256_PREFIX="c79401a0"  # torchvision convention: filename carries it
PTH="$OUTDIR/vgg19_bn-c79401a0.pth"
NPZ="$OUTDIR/vgg19_bn.npz"

mkdir -p "$OUTDIR"
if [ ! -f "$PTH" ]; then
    echo "downloading $URL"
    curl -fL --retry 3 -o "$PTH.tmp" "$URL"
    mv "$PTH.tmp" "$PTH"
fi

FULL=$(sha256sum "$PTH" | cut -d' ' -f1)
if [ -n "${VGG19_BN_SHA256:-}" ]; then
    if [ "$FULL" != "$VGG19_BN_SHA256" ]; then
        echo "CHECKSUM MISMATCH: expected sha256 $VGG19_BN_SHA256," >&2
        echo "got $FULL — refusing to convert $PTH" >&2
        exit 1
    fi
    echo "checksum ok (full sha256)"
elif [ "${FULL:0:8}" != "$SHA256_PREFIX" ]; then
    echo "CHECKSUM MISMATCH: expected sha256 prefix $SHA256_PREFIX," >&2
    echo "got ${FULL:0:8} — refusing to convert $PTH" >&2
    exit 1
else
    echo "checksum prefix ok (${FULL:0:8}); set VGG19_BN_SHA256 for a" \
         "full pin"
fi

python -m shadow_removal_istd_tpu.tools.convert_vgg \
    --state-dict "$PTH" --out "$NPZ"
echo "done: pass --vgg-weights $NPZ to training"
