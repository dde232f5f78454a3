"""Checkpointing: pytree save/load + reference ``.conv`` interchange shim.

Native format: a directory with a JSON manifest (shapes, dtypes, scales,
config) + one ``.npz`` of all arrays — unlike the reference, shape metadata
travels with the payload, so mismatched loads fail loudly instead of
silently corrupting (cf. SURVEY.md §2.7).

``.conv`` shim: byte-compatible with the reference's per-stage raw-float32
files (``SaveLoad_conv``/``SaveLoad_vec``, source/netlib.cpp:200-272) —
filename ``C_weights_{L}{_in|_out}_D=…_M=…_Lk=…_Ll=…_S=….conv``, payload
all kernel weights in (m,d,k,l) row-major order followed by the M biases.
Validates parity with reference-produced checkpoints.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import half_extent
from ..core.types import AEParams, ConvStage, NetSpec, OptState, StageSpec

FORMAT_VERSION = 1


# --------------------------------------------------------------- native pytree

def save(path: str | Path, params: AEParams, spec: NetSpec,
         opt: OptState | None = None, extra: dict | None = None) -> None:
    import jax
    if jax.process_index() != 0:
        # multi-host runs: params are replicated; only the coordinator
        # writes (every process calls save — the others return here)
        return
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    arrays: dict[str, np.ndarray] = {}
    for i, st in enumerate(params.stages):
        arrays[f"stage{i}/c"] = np.asarray(st.c)
        arrays[f"stage{i}/b"] = np.asarray(st.b)
    if opt is not None:
        for i, st in enumerate(opt.mom.stages):
            arrays[f"mom{i}/c"] = np.asarray(st.c)
            arrays[f"mom{i}/b"] = np.asarray(st.b)
        for i, st in enumerate(opt.prev_grad.stages):
            arrays[f"pg{i}/c"] = np.asarray(st.c)
            arrays[f"pg{i}/b"] = np.asarray(st.b)
    np.savez(path / "arrays.npz", **arrays)
    manifest = {
        "format_version": FORMAT_VERSION,
        "n_stages": len(params.stages),
        "has_opt": opt is not None,
        "spec": {
            "nx": spec.nx, "ny": spec.ny, "d": spec.d,
            "stages": [dataclasses.asdict(s) for s in spec.stages],
        },
        "shapes": {k: list(v.shape) for k, v in arrays.items()},
        "dtypes": {k: str(v.dtype) for k, v in arrays.items()},
        "extra": extra or {},
    }
    (path / "manifest.json").write_text(json.dumps(manifest, indent=2))


_SAVE_POOL = None


def save_async(path: str | Path, params: AEParams, spec: NetSpec,
               opt: OptState | None = None, extra: dict | None = None):
    """Non-blocking :func:`save`: device→host fetch and file IO run on a
    single background worker (saves stay ordered), so the train loop
    never stalls on checkpoint writes.  Returns a ``Future``; call
    :func:`wait_pending_saves` (or ``.result()``) before exiting.

    Safe because jax arrays are immutable — the worker snapshots exactly
    the params passed in even if training continues.
    """
    global _SAVE_POOL
    if _SAVE_POOL is None:
        from concurrent.futures import ThreadPoolExecutor
        _SAVE_POOL = ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="ckpt-save")
    return _SAVE_POOL.submit(save, path, params, spec, opt, extra)


def wait_pending_saves() -> None:
    """Block until every :func:`save_async` in flight has committed."""
    global _SAVE_POOL
    if _SAVE_POOL is not None:
        _SAVE_POOL.shutdown(wait=True)
        _SAVE_POOL = None


def save_rotating(root: str | Path, params: AEParams, spec: NetSpec,
                  opt: OptState | None = None, extra: dict | None = None,
                  *, step: int, keep: int = 3,
                  extra_files=None) -> Path:
    """Step-stamped checkpoint history: writes ``root/step_{step:08d}``,
    points ``root/LATEST`` at it, prunes to the newest ``keep`` — the
    standard guard against a crash mid-write corrupting the only copy
    (the reference keeps exactly one shape-keyed file set, SURVEY §2.7).

    ``extra_files(dest)`` runs on the coordinator only, after the pytree
    save but BEFORE ``LATEST`` moves, so sidecar files (e.g. optax state)
    are committed before the checkpoint becomes resolvable — a crash in
    between leaves ``LATEST`` on the previous complete step.
    """
    root = Path(root)
    dest = root / f"step_{step:08d}"
    save(dest, params, spec, opt, extra={**(extra or {}), "step": step})
    if jax.process_index() != 0:
        # save() only creates dest on the coordinator; sidecars written
        # here would hit a missing directory (or race N writers on a
        # shared filesystem)
        return dest
    if extra_files is not None:
        extra_files(dest)
    (root / "LATEST").write_text(dest.name)
    # prune to `keep` total, but NEVER the directory just written (it is
    # what LATEST points at).  Order by RECENCY (mtime), not name: a
    # divergence rollback re-saves an *earlier* step, so by name the
    # rollback target sorts below the NaN-era dirs and name-order pruning
    # would delete the fresh good checkpoints while retaining the
    # diverged ones forever
    olds = sorted((p for p in root.iterdir()
                   if p.is_dir() and p.name.startswith("step_")
                   and p != dest),
                  key=lambda p: p.stat().st_mtime)
    if keep <= 0:           # unlimited history — prune nothing
        doomed = []
    elif keep == 1:
        doomed = olds
    else:
        doomed = olds[:-(keep - 1)]
    for p in doomed:
        import shutil
        shutil.rmtree(p, ignore_errors=True)
    return dest


def resolve(path: str | Path) -> Path:
    """Resolve a checkpoint argument to a concrete checkpoint directory —
    either the directory itself or, for a :func:`save_rotating` root, the
    directory its ``LATEST`` marker points at."""
    path = Path(path)
    if not (path / "manifest.json").exists() and (path / "LATEST").exists():
        return path / (path / "LATEST").read_text().strip()
    return path


def load(path: str | Path):
    """Returns (params, spec, opt_or_None, extra).

    Accepts either a single checkpoint directory or a rotation root
    written by :func:`save_rotating` (resolved through ``LATEST``).
    """
    path = resolve(path)
    manifest = json.loads((path / "manifest.json").read_text())
    if manifest["format_version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version "
                         f"{manifest['format_version']}")
    data = np.load(path / "arrays.npz")
    for k, shape in manifest["shapes"].items():
        if list(data[k].shape) != shape:
            raise ValueError(f"shape mismatch for {k}: "
                             f"{data[k].shape} != {shape}")
    n = manifest["n_stages"]
    params = AEParams(stages=tuple(
        ConvStage(c=jnp.asarray(data[f"stage{i}/c"]),
                  b=jnp.asarray(data[f"stage{i}/b"])) for i in range(n)))
    opt = None
    if manifest["has_opt"]:
        opt = OptState(
            mom=AEParams(stages=tuple(
                ConvStage(c=jnp.asarray(data[f"mom{i}/c"]),
                          b=jnp.asarray(data[f"mom{i}/b"]))
                for i in range(n))),
            prev_grad=AEParams(stages=tuple(
                ConvStage(c=jnp.asarray(data[f"pg{i}/c"]),
                          b=jnp.asarray(data[f"pg{i}/b"]))
                for i in range(n))))
    sm = manifest["spec"]
    spec = NetSpec(nx=sm["nx"], ny=sm["ny"], d=sm["d"],
                   stages=tuple(StageSpec(**s) for s in sm["stages"]))
    return params, spec, opt, manifest.get("extra", {})


# --------------------------------------------------------- optax opt state

def save_optax_state(path: str | Path, state) -> None:
    """Persist an arbitrary optax state pytree (leaves in flatten order).

    The tree *structure* is not serialized — the loader rebuilds it from a
    freshly-initialized state of the same optimizer (the CLI reconstructs
    the optimizer from its flags), so only the leaves travel.
    """
    leaves = jax.tree_util.tree_leaves(state)
    arrays = {f"leaf{i}": np.asarray(l) for i, l in enumerate(leaves)}
    np.savez(Path(path), **arrays)


def load_optax_state(path: str | Path, like):
    """Restore an optax state saved by :func:`save_optax_state` into the
    structure of ``like`` (a freshly-initialized state of the same
    optimizer).  Leaf count/shape mismatches fail loudly."""
    data = np.load(Path(path))
    treedef = jax.tree_util.tree_structure(like)
    want = jax.tree_util.tree_leaves(like)
    if len(data.files) != len(want):
        raise ValueError(f"optax state leaf count mismatch: checkpoint has "
                         f"{len(data.files)}, optimizer expects {len(want)}")
    leaves = []
    for i, w in enumerate(want):
        arr = data[f"leaf{i}"]
        if tuple(arr.shape) != tuple(np.shape(w)):
            raise ValueError(f"optax state leaf {i} shape mismatch: "
                             f"{arr.shape} != {np.shape(w)}")
        leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ------------------------------------------------------------------ .conv shim

def conv_filename(level: int, io: int, d: int, m: int, nk: int, nl: int,
                  scale: int) -> str:
    """The reference's shape-in-the-filename scheme (netlib.cpp:230-234)."""
    inout = "_in" if io == 0 else "_out"
    return (f"C_weights_{level}{inout}_D={d}_M={m}"
            f"_Lk={half_extent(nk)}_Ll={half_extent(nl)}_S={scale}.conv")


def export_conv(stage: ConvStage, path: str | Path) -> None:
    """Write one stage in reference binary layout (netlib.cpp:236-253)."""
    c = np.asarray(stage.c, dtype=np.float32)
    b = np.asarray(stage.b, dtype=np.float32)
    with open(path, "wb") as fh:
        fh.write(c.tobytes())   # (m,d,k,l) row-major == reference flattening
        fh.write(b.tobytes())


def import_conv(path: str | Path, m: int, d: int, nk: int, nl: int) -> ConvStage:
    """Read one reference-format stage file (netlib.cpp:254-271).

    Shapes come from the caller (in the reference, from the filename)."""
    raw = np.fromfile(path, dtype="<f4")
    want = m * d * nk * nl + m
    if raw.size != want:
        raise ValueError(f"{path}: expected {want} floats, got {raw.size}")
    c = raw[: m * d * nk * nl].reshape(m, d, nk, nl)
    b = raw[m * d * nk * nl:]
    return ConvStage(c=jnp.asarray(c), b=jnp.asarray(b))


def save_pair_conv(params: AEParams, spec: NetSpec, n_l: int,
                   weights_dir: str | Path) -> tuple[Path, Path]:
    """'s' key semantics: save the selected stage pair
    (source/autoencoder.cpp:358-369)."""
    weights_dir = Path(weights_dir)
    weights_dir.mkdir(parents=True, exist_ok=True)
    n = len(params.stages)
    enc, dec = params.pair(n_l)
    enc_spec, dec_spec = spec.stages[n_l], spec.stages[n - 1 - n_l]
    p_enc = weights_dir / conv_filename(n_l, 0, enc.d, enc.m, enc.nk, enc.nl,
                                        enc_spec.scale)
    p_dec = weights_dir / conv_filename(n_l, 1, dec.d, dec.m, dec.nk, dec.nl,
                                        dec_spec.scale)
    export_conv(enc, p_enc)
    export_conv(dec, p_dec)
    return p_enc, p_dec


def load_pair_conv(params: AEParams, spec: NetSpec, n_l: int,
                   weights_dir: str | Path) -> AEParams:
    """'l' key semantics: load the selected stage pair
    (source/autoencoder.cpp:370-383)."""
    weights_dir = Path(weights_dir)
    n = len(params.stages)
    enc, dec = params.pair(n_l)
    enc_spec, dec_spec = spec.stages[n_l], spec.stages[n - 1 - n_l]
    p_enc = weights_dir / conv_filename(n_l, 0, enc.d, enc.m, enc.nk, enc.nl,
                                        enc_spec.scale)
    p_dec = weights_dir / conv_filename(n_l, 1, dec.d, dec.m, dec.nk, dec.nl,
                                        dec_spec.scale)
    new_enc = import_conv(p_enc, enc.m, enc.d, enc.nk, enc.nl)
    new_dec = import_conv(p_dec, dec.m, dec.d, dec.nk, dec.nl)
    return params.replace_pair(n_l, new_enc, new_dec)
