#!/usr/bin/env bash
# Two-stage Google Drive download (reference scripts/download_from_gdrive.sh).
# Usage: ./download_from_gdrive.sh <file-id> <output-path>
set -euo pipefail

if [ $# -ne 2 ]; then
    echo "usage: $0 <gdrive-file-id> <output-path>" >&2
    exit 1
fi

FILE_ID="$1"
DEST="$2"
COOKIES="$(mktemp)"
trap 'rm -f "$COOKIES"' EXIT

# stage 1: obtain the confirmation token for large files
CONFIRM=$(curl -sc "$COOKIES" \
    "https://docs.google.com/uc?export=download&id=${FILE_ID}" |
    grep -o 'confirm=[^&"]*' | head -1 | cut -d= -f2 || true)

# stage 2: download with the token
curl -Lb "$COOKIES" \
    "https://docs.google.com/uc?export=download&confirm=${CONFIRM}&id=${FILE_ID}" \
    -o "$DEST"
echo "downloaded ${DEST}"
