"""Ahead-of-time model export for serving (jax.export / StableHLO).

The reference has no serving story — inference is welded to the interactive
OpenCV loop (source/autoencoder.cpp:121-151).  The TPU-native equivalent for
production deployment is an *ahead-of-time compiled artifact*: the forward
(or encoder-only) pass is traced once, lowered to StableHLO with
``jax.export``, and serialized to disk together with a JSON manifest.  A
server process then deserializes and calls it without tracing, without the
model source, and — with multi-platform lowering — on a machine class
(CPU/TPU) chosen at load time, not export time.

Artifact layout (a directory)::

    manifest.json      what/domain/shapes/platforms/spec, format version
    <name>.stablehlo   jax.export serialized bytes (one per exported fn)

Weights are baked into the artifact as constants (a serving snapshot, not a
training checkpoint — use ``spectralae.io.checkpoint`` for those).

The batch dimension can be exported symbolically (``batch=None``) so one
artifact serves any batch size, using jax.export shape polymorphism.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from ..core.types import AEParams, NetSpec
from ..model import autoencoder as model

FORMAT_VERSION = 1

_WHAT = ("forward", "encode")


def _build_fn(params: AEParams, spec: NetSpec, what: str, domain: str,
              tap_mode: str):
    scales = spec.scales
    if what == "forward":
        if domain == "fft":
            return lambda x: model.forward_fft(params, x, scales)
        return lambda x: model.forward_coord(params, x, scales,
                                             tap_mode=tap_mode)[-1]
    if what == "encode":
        return lambda x: model.encode(params, x, scales, domain=domain,
                                      tap_mode=tap_mode)
    raise ValueError(f"what must be one of {_WHAT}, got {what!r}")


def export_model(params: AEParams, spec: NetSpec, path: str | Path, *,
                 what: str = "forward", domain: str = "fft",
                 batch: int | None = None, dtype=jnp.float32,
                 platforms: tuple[str, ...] | None = None,
                 tap_mode: str | None = None,
                 extra: dict | None = None) -> Path:
    """Export an AOT-compiled serving artifact.

    Args:
      what: ``"forward"`` (full reconstruction) or ``"encode"``
        (bottleneck features — the serving path).
      domain: ``"fft"`` or ``"coord"`` compute domain.
      batch: fixed batch size, or ``None`` for a symbolic batch dimension
        (one artifact serves any batch size).
      platforms: lowering platforms, e.g. ``("cpu", "tpu")`` for an
        artifact loadable on either; ``None`` = the ambient platform.
      tap_mode: coord-domain tap window.  ``None`` defaults to
        ``"ref_gpu"`` — the window the interactive engine trains with by
        default (gpu flag on), so an exported coord model computes the
        same convolution as the runtime that produced its weights.  Pass
        ``"ref_cpu"``/``"centered"`` for nets trained with those taps.
        Ignored for ``domain="fft"``.

    Returns the artifact directory path.
    """
    if tap_mode is None:
        tap_mode = "ref_gpu"
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    fn = _build_fn(params, spec, what, domain, tap_mode)

    if batch is None:
        (b,) = jax_export.symbolic_shape("b")
        in_spec = jax.ShapeDtypeStruct((b, spec.d, spec.nx, spec.ny), dtype)
    else:
        in_spec = jax.ShapeDtypeStruct((batch, spec.d, spec.nx, spec.ny),
                                       dtype)
    kwargs = {} if platforms is None else {"platforms": list(platforms)}
    exported = jax_export.export(jax.jit(fn), **kwargs)(in_spec)
    blob = exported.serialize()
    (path / f"{what}.stablehlo").write_bytes(blob)

    manifest = {
        "format_version": FORMAT_VERSION,
        "what": what,
        "domain": domain,
        "tap_mode": tap_mode,
        "batch": batch,
        "dtype": str(np.dtype(dtype)),
        "input_shape": [spec.d, spec.nx, spec.ny],
        "platforms": list(exported.platforms),
        "spec": {
            "nx": spec.nx, "ny": spec.ny, "d": spec.d,
            "n_stages": len(spec.stages),
        },
        "extra": extra or {},
    }
    (path / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return path


class ServingModel:
    """A deserialized AOT artifact, callable without the model source.

    ``ServingModel.load(path)`` reads the manifest + StableHLO blob;
    ``__call__`` runs the compiled function on a ``[B, D, Nx, Ny]`` array
    (B must match the exported batch unless it was exported symbolically).
    """

    def __init__(self, exported, manifest: dict):
        self._exported = exported
        self.manifest = manifest
        self._call = jax.jit(exported.call)

    @classmethod
    def load(cls, path: str | Path) -> "ServingModel":
        path = Path(path)
        if not (path / "manifest.json").exists():
            # an `export --what both` root holds per-function subdirs;
            # prefer the forward artifact, else the single subdir present
            for sub in ("forward", "encode"):
                if (path / sub / "manifest.json").exists():
                    path = path / sub
                    break
        manifest = json.loads((path / "manifest.json").read_text())
        if manifest["format_version"] != FORMAT_VERSION:
            raise ValueError("unsupported export format version "
                             f"{manifest['format_version']}")
        blob = (path / f"{manifest['what']}.stablehlo").read_bytes()
        exported = jax_export.deserialize(blob)
        return cls(exported, manifest)

    @property
    def input_shape(self) -> tuple:
        return tuple(self.manifest["input_shape"])

    def __call__(self, x) -> jax.Array:
        d, nx, ny = self.input_shape
        if x.ndim != 4 or x.shape[1:] != (d, nx, ny):
            raise ValueError(
                f"expected input [B, {d}, {nx}, {ny}], got {x.shape}")
        want_b = self.manifest["batch"]
        if want_b is not None and x.shape[0] != want_b:
            raise ValueError(
                f"artifact was exported for batch={want_b}, got "
                f"{x.shape[0]} (re-export with batch=None for a "
                "batch-polymorphic artifact)")
        return self._call(jnp.asarray(x))
