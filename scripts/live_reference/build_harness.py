"""Build the live-reference differential harness (harness_main.rs) against
the PUBLIC reference crate at $QFS_REFERENCE_PATH (default /root/reference).

The sandbox has no crates.io access, so the reference's one hard dependency
(xxhash-rust) is satisfied by the local compile-time stub in
xxhash_stub.rs via a [patch.crates-io] path override — see that file for
why this cannot weaken the differential claims (the fingerprint-level API
under test never calls the item hasher). The build is fully offline: every
dependency is a path dependency, and CARGO_HOME points at a scratch dir so
no user-level cargo configuration (registry mirrors etc.) is consulted.

Usage:
    python scripts/live_reference/build_harness.py   # prints binary path
or  from build_harness import ensure_harness; ensure_harness()
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from pathlib import Path

_SRC = Path(__file__).resolve().parent

_STUB_TOML = """\
[package]
name = "xxhash-rust"
version = "0.8.12"
edition = "2021"

[features]
xxh3 = []
"""

_HARNESS_TOML = """\
[package]
name = "qfilter-live-harness"
version = "0.1.0"
edition = "2021"

[dependencies]
qfilter = {{ path = "{ref_path}" }}

[patch.crates-io]
xxhash-rust = {{ path = "../xxhash-rust" }}
"""


def _sync(path: Path, content: str) -> None:
    """Write only when the content differs (preserves mtimes for cargo)."""
    if not path.is_file() or path.read_text() != content:
        path.write_text(content)


def cargo_available() -> bool:
    return shutil.which("cargo") is not None


def reference_path() -> Path:
    return Path(os.environ.get("QFS_REFERENCE_PATH", "/root/reference"))


def ensure_harness(workdir: str | None = None) -> Path:
    """Materialize the cargo workspace and build the harness binary.

    Rebuilds only when the sources changed (cargo's own incremental check).
    Returns the path to the release binary.
    """
    if not cargo_available():
        raise RuntimeError("cargo not on PATH")
    ref = reference_path()
    if not (ref / "Cargo.toml").is_file():
        raise RuntimeError(f"reference crate not found at {ref}")

    ws = Path(workdir or os.environ.get(
        "QFS_LIVE_REF_BUILD",
        os.path.join(tempfile.gettempdir(), "qfs_live_ref_build")))
    stub = ws / "xxhash-rust"
    harness = ws / "harness"
    (stub / "src").mkdir(parents=True, exist_ok=True)
    (harness / "src").mkdir(parents=True, exist_ok=True)
    # write-if-changed: cargo's freshness check is mtime-based, so an
    # unconditional write would force a full recompile on every call
    _sync(stub / "Cargo.toml", _STUB_TOML)
    _sync(stub / "src" / "lib.rs", (_SRC / "xxhash_stub.rs").read_text())
    _sync(harness / "Cargo.toml", _HARNESS_TOML.format(ref_path=ref))
    _sync(harness / "src" / "main.rs", (_SRC / "harness_main.rs").read_text())

    env = dict(os.environ)
    env["CARGO_HOME"] = str(ws / "cargo_home")   # ignore user-level config
    subprocess.run(
        ["cargo", "build", "--release", "--offline"],
        cwd=harness, env=env, check=True,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    binary = harness / "target" / "release" / "qfilter-live-harness"
    if not binary.is_file():
        raise RuntimeError(f"build produced no binary at {binary}")
    return binary


if __name__ == "__main__":
    print(ensure_harness())
