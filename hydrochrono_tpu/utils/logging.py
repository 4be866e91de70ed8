"""CLI logging / observability.

A compact re-design of the reference logging subsystem
(src/utils/logging.cpp + logger_backend.cpp, docs/logging_internals.md):
leveled console+file logging, aligned info lines, section boxes, progress
bar, and warning collection for a unified warnings block at the end of a run.
`capture_third_party` re-creates the reference's stream interception
(logging.cpp:406-541): Python `warnings`, stdlib `logging` records, and raw
C-level stderr writes (libtpu/XLA spew) are collected into the same
warnings list so a run ends with ONE unified warnings block.
"""

from __future__ import annotations

import contextlib
import dataclasses
import sys
import time
from typing import Optional, TextIO

LEVELS = {"trace": 5, "debug": 10, "info": 20, "success": 25,
          "warning": 30, "error": 40, "quiet": 100}


@dataclasses.dataclass
class LoggingConfig:
    console_level: str = "info"
    file_level: str = "debug"
    log_file: Optional[str] = None
    use_color: bool = True
    # size-based rotation (reference: logger_backend.h:39-160 FileBackend
    # max_file_size/max_files): when the log file exceeds max_bytes it is
    # rotated to .1 .. .backup_count before opening a fresh file. 0 = off.
    max_bytes: int = 5 * 1024 * 1024
    backup_count: int = 3


class Logger:
    def __init__(self, config: Optional[LoggingConfig] = None, stream: TextIO = None):
        self.config = config or LoggingConfig()
        self.stream = stream or sys.stdout
        self._file = self._open_file() if self.config.log_file else None
        self.warnings: list[str] = []
        self.counts: dict[str, int] = {}  # per-level emit statistics
        self._t0 = time.time()

    def _open_file(self):
        self._maybe_rotate()
        return open(self.config.log_file, "a")

    def _maybe_rotate(self):
        """Size-based rotation: file -> file.1 -> ... -> file.N (dropped).
        Mirrors the reference FileBackend's max_file_size/max_files
        (logger_backend.h:39-160)."""
        import os

        cfg = self.config
        if not cfg.max_bytes or cfg.backup_count <= 0:
            return
        try:
            if os.path.getsize(cfg.log_file) < cfg.max_bytes:
                return
        except OSError:
            return
        for i in range(cfg.backup_count - 1, 0, -1):
            src, dst = f"{cfg.log_file}.{i}", f"{cfg.log_file}.{i + 1}"
            if os.path.exists(src):
                os.replace(src, dst)
        os.replace(cfg.log_file, f"{cfg.log_file}.1")

    # ----- core -----
    def _emit(self, level: str, msg: str, prefix: str = ""):
        lv = LEVELS[level]
        self.counts[level] = self.counts.get(level, 0) + 1
        line = f"{prefix}{msg}"
        if lv >= LEVELS[self.config.console_level]:
            print(line, file=self.stream)
        if self._file and lv >= LEVELS[self.config.file_level]:
            ts = time.strftime("%Y-%m-%dT%H:%M:%S")
            self._file.write(f"{ts} [{level.upper():7s}] {msg}\n")
            self._file.flush()
            if (self.config.max_bytes
                    and self._file.tell() >= self.config.max_bytes):
                self._file.close()
                self._file = self._open_file()

    def trace(self, msg):
        self._emit("trace", msg, "  · ")

    def debug(self, msg):
        self._emit("debug", msg, "  › ")

    def info(self, msg):
        self._emit("info", msg)

    def success(self, msg):
        self._emit("success", msg, "✓ ")

    def warning(self, msg):
        self.warnings.append(str(msg))
        self._emit("warning", msg, "⚠ ")

    def error(self, msg):
        self._emit("error", msg, "✗ ")

    # ----- structured CLI pieces (reference: cli::ShowBanner/SectionBox) -----
    def banner(self, title: str, version: str):
        width = 64
        self.info("╔" + "═" * (width - 2) + "╗")
        body = f"{title}  v{version}"
        self.info("║" + body.center(width - 2) + "║")
        self.info("╚" + "═" * (width - 2) + "╝")

    def header(self, title: str):
        self.info("")
        self.info(f"── {title} " + "─" * max(0, 60 - len(title)))

    def aligned(self, label: str, value, bullet: str = "•", width: int = 28):
        self.info(f"  {bullet} {label:<{width}} {value}")

    def section_box(self, title: str, rows: list):
        width = max([len(title)] + [len(f"{k}: {v}") for k, v in rows]) + 4
        self.info("┌─ " + title + " " + "─" * max(0, width - len(title) - 3) + "┐")
        for k, v in rows:
            self.info(f"│  {k:<24} {v}")
        self.info("└" + "─" * (width + 1) + "┘")

    def progress(self, frac: float, extra: str = ""):
        frac = min(max(frac, 0.0), 1.0)
        width = 36
        filled = int(width * frac)
        bar = "█" * filled + "░" * (width - filled)
        print(f"\r  [{bar}] {100 * frac:5.1f}% {extra}", end="", file=self.stream, flush=True)
        if frac >= 1.0:
            print(file=self.stream)

    def show_warnings_block(self):
        if not self.warnings:
            return
        self.header(f"Warnings ({len(self.warnings)})")
        for w in self.warnings:
            self.info(f"  ⚠ {w}")

    def stats(self) -> dict:
        """Per-level message counts + uptime (logger_backend.h stats role)."""
        return {"uptime_s": time.time() - self._t0, "counts": dict(self.counts)}

    def close(self):
        if self._file:
            if self.counts:
                parts = ", ".join(f"{k}={v}" for k, v in sorted(self.counts.items()))
                ts = time.strftime("%Y-%m-%dT%H:%M:%S")
                self._file.write(
                    f"{ts} [STATS  ] uptime {time.time() - self._t0:.1f}s; "
                    f"{parts}\n")
            self._file.close()
            self._file = None


@contextlib.contextmanager
def capture_third_party(logger: Logger, stderr_fd: bool = True):
    """Collect third-party diagnostics into `logger.warnings` for the run.

    Reference parity: src/utils/logging.cpp:406-541 intercepts stray
    stdout/stderr streams into the logging subsystem so the user sees one
    unified warnings block instead of raw spew. Three channels here:

      1. the Python ``warnings`` module (e.g. the ERA fit-quality
         RuntimeWarning from stepper.py),
      2. stdlib ``logging`` records at WARNING+ (jax emits through these),
      3. raw writes to file descriptor 2 — libtpu / XLA / absl C++ output
         that bypasses every Python hook (captured via dup2 into a temp
         file, restored and harvested on exit; ``stderr_fd=False`` skips
         this process-global step, e.g. under pytest's own capture).

    Captured lines surface ONLY in the end-of-run warnings block; nothing
    is double-printed mid-run. On abnormal exit the fd is restored before
    the interpreter prints the traceback, so crashes stay visible.
    """
    import logging as _pylog
    import warnings as _warnings

    # --- channel 1: warnings module ---
    prev_show = _warnings.showwarning

    def _show(message, category, filename, lineno, file=None, line=None):
        logger.warnings.append(f"{category.__name__}: {message}")
        logger.counts["warning"] = logger.counts.get("warning", 0) + 1

    # --- channel 2: stdlib logging ---
    class _Handler(_pylog.Handler):
        def emit(self, record):
            try:
                logger.warnings.append(
                    f"{record.name}: {record.getMessage()}")
            except Exception:
                pass

    handler = _Handler(level=_pylog.WARNING)
    root = _pylog.getLogger()
    prev_root_level = root.level

    # --- channel 3: raw fd 2 ---
    import faulthandler
    import os
    import tempfile

    saved_fd = spool = crash_file = None
    fh_was_enabled = faulthandler.is_enabled()
    if stderr_fd:
        try:
            saved_fd = os.dup(2)
            # NAMED spool (ADVICE r4): a hard native crash (SIGSEGV/abort in
            # libtpu) skips the finally-harvest — the file then survives on
            # disk for post-mortem instead of vanishing with an unlinked fd
            spool = tempfile.NamedTemporaryFile(prefix="hctpu_stderr_",
                                                delete=False)
            sys.stderr.flush()
            os.dup2(spool.fileno(), 2)
            # fatal-signal tracebacks go to the REAL stderr, not the spool
            crash_file = os.fdopen(os.dup(saved_fd), "w")
            faulthandler.enable(file=crash_file)
        except OSError:
            saved_fd = spool = None

    prev_filters = _warnings.filters[:]
    _warnings.showwarning = _show
    _warnings.simplefilter("always")
    root.addHandler(handler)
    try:
        yield
    finally:
        _warnings.showwarning = prev_show
        _warnings.filters[:] = prev_filters
        root.removeHandler(handler)
        root.setLevel(prev_root_level)
        if saved_fd is not None:
            try:
                sys.stderr.flush()
                os.dup2(saved_fd, 2)
                os.close(saved_fd)
                if fh_was_enabled:
                    faulthandler.enable()  # back onto the restored fd 2
                else:
                    faulthandler.disable()
                if crash_file is not None:
                    crash_file.close()
                spool.seek(0)
                raw = spool.read().decode("utf-8", "replace")
                spool.close()
                os.unlink(spool.name)
                lines = [ln.strip() for ln in raw.splitlines() if ln.strip()]
                # head + tail: the tail is where native errors land
                HEAD, TAIL = 30, 10
                if len(lines) <= HEAD + TAIL:
                    shown = lines
                else:
                    shown = (lines[:HEAD]
                             + [f"... (+{len(lines) - HEAD - TAIL} more lines)"]
                             + lines[-TAIL:])
                for ln in shown:
                    logger.warnings.append(f"[stderr] {ln}")
            except OSError:
                pass


_global: Optional[Logger] = None


def initialize(config: Optional[LoggingConfig] = None) -> Logger:
    global _global
    _global = Logger(config)
    return _global


def get_logger() -> Logger:
    global _global
    if _global is None:
        _global = Logger()
    return _global


def shutdown():
    global _global
    if _global is not None:
        _global.close()
        _global = None
