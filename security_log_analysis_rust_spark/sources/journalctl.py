"""journalctl subprocess source — the live-ingest bridge.

The reference spawns ``journalctl -o json`` for batch catch-up and
``journalctl -f -o json`` for tailing (``src/parse_logs.rs:262-269`` and
``:306-326``). This sandbox has no journald, so the engine's readers take
JSONL *files*; this module completes the ingest surface with a thin
``subprocess -> spool file -> existing reader`` adapter:

* :func:`spool_journalctl` — run once, write the JSON lines into rotating
  spool files; feed :func:`..sources.logfiles.read_journald_json`.
* :func:`follow_journalctl` — the ``-f`` variant on a background thread,
  rotating closed files into the directory watched by
  ``streaming.journald_stream.read_journald_stream`` (Structured
  Streaming's file source only ever sees complete files: each spool file is
  written as ``.tmp`` and renamed into place on close).

Everything is parameterized on the binary path so tests run against a fake
``journalctl`` executable; a real-binary integration test is skipped where
journald is absent.
"""

from __future__ import annotations

import os
import subprocess
import threading
from typing import List, Optional, Sequence


def journalctl_command(
    binary: str = "journalctl",
    units: Sequence[str] = (),
    since: Optional[str] = None,
    follow: bool = False,
) -> List[str]:
    """Build the argv (reference flags: ``-o json``, ``-u UNIT``,
    ``--since``, ``-f``)."""
    cmd = [binary, "-o", "json"]
    for u in units:
        cmd += ["-u", u]
    if since is not None:
        cmd += ["--since", since]
    if follow:
        cmd.append("-f")
    return cmd


def _next_seq(spool_dir: str) -> int:
    """Seed the spool sequence PAST every existing ``journal-*.json``.

    A daemon restart into the same spool dir is the routine lifecycle; if
    sequence numbers restarted at 0, new output would overwrite earlier
    spool files — and Structured Streaming's file source (which tracks seen
    files by PATH in its checkpoint) would never re-read the overwritten
    names, silently losing those records."""
    import glob as _glob
    import re as _re

    top = 0
    for p in _glob.glob(os.path.join(spool_dir, "journal-*.json")):
        m = _re.fullmatch(r"journal-(\d+)\.json", os.path.basename(p))
        if m:
            top = max(top, int(m.group(1)) + 1)
    return top


def _commit(spool_dir: str, seq: int, lines: List[str]) -> str:
    """Write one spool file atomically (tmp + rename); refuses to replace
    an existing final path (a duplicate name means a sequencing bug, and
    clobbering it would destroy records a stream reader hasn't seen)."""
    final = os.path.join(spool_dir, f"journal-{seq:06d}.json")
    if os.path.exists(final):
        raise FileExistsError(
            f"spool file {final} already exists; refusing to overwrite "
            "(records in it may be unread)"
        )
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(tmp, final)
    return final


def spool_journalctl(
    spool_dir: str,
    binary: str = "journalctl",
    units: Sequence[str] = (),
    since: Optional[str] = None,
    lines_per_file: int = 10_000,
    max_lines: Optional[int] = None,
    timeout: Optional[float] = None,
) -> List[str]:
    """Batch catch-up: run ``journalctl -o json`` once and spool its output.

    Returns the list of committed spool files; read them with
    ``read_journald_json(spark, spool_dir)``. ``max_lines`` bounds the run
    (tests / incremental windows)."""
    os.makedirs(spool_dir, exist_ok=True)
    cmd = journalctl_command(binary, units=units, since=since, follow=False)
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True
    )
    written: List[str] = []
    buf: List[str] = []
    seq = _next_seq(spool_dir)
    n = 0
    try:
        assert proc.stdout is not None
        for line in proc.stdout:
            line = line.rstrip("\n")
            if not line:
                continue
            buf.append(line)
            n += 1
            if len(buf) >= lines_per_file:
                written.append(_commit(spool_dir, seq, buf))
                seq += 1
                buf = []
            if max_lines is not None and n >= max_lines:
                proc.terminate()
                break
        if buf:
            written.append(_commit(spool_dir, seq, buf))
    finally:
        try:
            proc.wait(timeout=timeout or 30)
        except subprocess.TimeoutExpired:
            proc.kill()
    return written


class JournalFollower:
    """``journalctl -f -o json`` on a background thread, rotating spool
    files so a Structured Streaming file source can tail them."""

    def __init__(
        self,
        spool_dir: str,
        binary: str = "journalctl",
        units: Sequence[str] = (),
        rotate_lines: int = 1_000,
    ):
        self.spool_dir = spool_dir
        self.rotate_lines = rotate_lines
        self._cmd = journalctl_command(binary, units=units, follow=True)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._proc: Optional[subprocess.Popen] = None
        self.files_written = 0

    def _run(self) -> None:
        os.makedirs(self.spool_dir, exist_ok=True)
        self._proc = subprocess.Popen(
            self._cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True
        )
        buf: List[str] = []
        seq = _next_seq(self.spool_dir)
        assert self._proc.stdout is not None
        for line in self._proc.stdout:
            if self._stop.is_set():
                break
            line = line.rstrip("\n")
            if line:
                buf.append(line)
            if len(buf) >= self.rotate_lines:
                _commit(self.spool_dir, seq, buf)
                self.files_written += 1
                seq += 1
                buf = []
        if buf:
            _commit(self.spool_dir, seq, buf)
            self.files_written += 1

    def start(self) -> "JournalFollower":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self, timeout: float = 10.0) -> None:
        self._stop.set()
        if self._proc is not None:
            self._proc.terminate()
            try:
                self._proc.wait(timeout=timeout)
            except subprocess.TimeoutExpired:
                self._proc.kill()
        if self._thread is not None:
            self._thread.join(timeout=timeout)


def follow_journalctl(
    spool_dir: str,
    binary: str = "journalctl",
    units: Sequence[str] = (),
    rotate_lines: int = 1_000,
) -> JournalFollower:
    """Start tailing; the returned follower's ``spool_dir`` is what you hand
    to ``start_journald_ingest`` (streaming) as the input directory."""
    return JournalFollower(
        spool_dir, binary=binary, units=units, rotate_lines=rotate_lines
    ).start()
