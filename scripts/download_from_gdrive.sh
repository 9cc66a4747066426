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
CONFIRM=$(curl -fsc "$COOKIES" \
    "https://docs.google.com/uc?export=download&id=${FILE_ID}" |
    grep -o 'confirm=[^&"]*' | head -1 | cut -d= -f2 || true)

# stage 2: download with the token (-f: fail on HTTP errors rather than
# saving the error page)
curl -fLb "$COOKIES" \
    "https://docs.google.com/uc?export=download&confirm=${CONFIRM}&id=${FILE_ID}" \
    -o "$DEST"

# Validate the payload: Google serves an HTML interstitial (quota pages,
# the newer uuid-form confirmation flow) with HTTP 200 — curl cannot
# catch that. Refuse to report success for an HTML "download".
if head -c 512 "$DEST" | grep -qiE '<!DOCTYPE html|<html'; then
    echo "error: ${DEST} is an HTML page, not the file — the confirm" \
         "token flow failed (quota exceeded or Google changed the" \
         "interstitial). Try a browser or gdown." >&2
    rm -f "$DEST"
    exit 1
fi
echo "downloaded ${DEST}"
