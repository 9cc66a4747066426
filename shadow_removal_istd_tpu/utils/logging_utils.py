"""Logging utilities (reference src/logger.py equivalents).

``TeeIo`` writes to a file and a stream simultaneously;
``TqdmStreamHandler`` routes stdlib logging through ``tqdm.write`` so
log lines don't mangle progress bars; ``setup_logging`` is the standard
file+console config the CLIs use (reference src/main.py:68-85).
"""

from __future__ import annotations

import logging
import sys
from typing import IO


class TeeIo:
    """File-like object duplicating writes to a file and a stream."""

    def __init__(self, filename: str, stream: IO = sys.stderr,
                 mode: str = "a"):
        self.file = open(filename, mode)
        self.stream = stream

    def write(self, data: str) -> int:
        self.stream.write(data)
        return self.file.write(data)

    def flush(self) -> None:
        self.stream.flush()
        self.file.flush()

    def close(self) -> None:
        self.file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class TqdmStreamHandler(logging.Handler):
    """Logging handler emitting through tqdm.write (keeps bars intact)."""

    def emit(self, record: logging.LogRecord) -> None:
        try:
            from tqdm.auto import tqdm
            tqdm.write(self.format(record))
        except Exception:
            self.handleError(record)


def setup_logging(log_file: str | None = None,
                  level: int = logging.INFO,
                  use_tqdm: bool = False) -> None:
    """File + console logging with the reference's format."""
    fmt = logging.Formatter(
        "%(asctime)s [%(module)s::%(funcName)s] %(levelname)s: %(message)s",
        datefmt="%H:%M:%S")
    root = logging.getLogger()
    root.setLevel(level)
    if log_file:
        import os
        log_dir = os.path.dirname(log_file)
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        root.addHandler(fh)
    handler = TqdmStreamHandler() if use_tqdm else logging.StreamHandler()
    handler.setFormatter(fmt)
    root.addHandler(handler)
