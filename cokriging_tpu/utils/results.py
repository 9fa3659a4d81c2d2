"""Committed evidence manifests for example/benchmark runs.

The reference's deliverable is inspectable notebook output — the executed
cells of research/modelling_comparison.ipynb carry its error-ratio maps,
MSPE tables, and LOOCV diagnostics inside the repo. This framework's
examples are scripts, so the equivalent evidence tier is ``results/`` at
the repo root: one small JSON manifest per recorded run (backend,
wall-clock, headline metrics, git revision) plus curated figures under
``results/figures/``. Manifests are committed so every measured claim in
the docs is reproducible-and-diffable in-repo; re-running the example
rewrites its manifest in place.

Recording is opt-in via ``record_manifest`` calls in the examples; set
``COKRIGING_RESULTS_DIR`` to redirect output (e.g. to a scratch dir when
experimenting), or ``COKRIGING_NO_RECORD=1`` to disable writing.
"""

import json
import os
import pathlib
import subprocess
import time


def _repo_root() -> pathlib.Path:
    return pathlib.Path(__file__).resolve().parents[2]


def results_dir() -> pathlib.Path:
    override = os.environ.get("COKRIGING_RESULTS_DIR")
    return pathlib.Path(override) if override else _repo_root() / "results"


def _git_rev() -> str:
    try:
        return (
            subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                cwd=_repo_root(),
                capture_output=True,
                text=True,
                timeout=10,
            ).stdout.strip()
            or "unknown"
        )
    except Exception:
        return "unknown"


def _jsonable(x):
    import numpy as np

    if isinstance(x, dict):
        return {k: _jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    if isinstance(x, (np.floating, np.integer)):
        return x.item()
    if isinstance(x, np.ndarray):
        return [_jsonable(v) for v in x.tolist()]
    if isinstance(x, float):
        return round(x, 6)
    return x


def record_manifest(name: str, payload: dict) -> pathlib.Path:
    """Write ``results/<name>.json`` with run metadata + ``payload``.

    Returns the path written (or the would-be path when disabled via
    COKRIGING_NO_RECORD).
    """
    root = results_dir()
    path = root / f"{name}.json"
    if os.environ.get("COKRIGING_NO_RECORD"):
        return path
    import jax

    out = {
        "example": name,
        "backend": jax.default_backend(),
        "devices": len(jax.devices()),
        "git_rev": _git_rev(),
        "recorded": time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime()),
        **_jsonable(payload),
    }
    root.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(f"[results] wrote {path}")
    return path


def save_figure(fig, name: str):
    """Save a curated figure into results/figures/<name>.png (committed)."""
    if os.environ.get("COKRIGING_NO_RECORD"):
        return None
    root = results_dir() / "figures"
    root.mkdir(parents=True, exist_ok=True)
    path = root / f"{name}.png"
    fig.savefig(path, dpi=110, bbox_inches="tight")
    print(f"[results] wrote {path}")
    return path
