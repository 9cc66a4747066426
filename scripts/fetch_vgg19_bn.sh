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
# The download is checksum-pinned: torchvision weight files embed the
# first 8 hex chars of their SHA-256 in the filename, and that value is
# hard-coded below, so a tampered or truncated download fails loudly.
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

ACTUAL=$(sha256sum "$PTH" | cut -c1-8)
if [ "$ACTUAL" != "$SHA256_PREFIX" ]; then
    echo "CHECKSUM MISMATCH: expected sha256 prefix $SHA256_PREFIX," >&2
    echo "got $ACTUAL — refusing to convert $PTH" >&2
    exit 1
fi
echo "checksum ok ($ACTUAL)"

python -m shadow_removal_istd_tpu.tools.convert_vgg \
    --state-dict "$PTH" --out "$NPZ"
echo "done: pass --vgg-weights $NPZ to training"
