"""Multi-host bootstrap: ``jax.distributed.initialize`` + mesh-from-flags.

The reference's only "distributed backend" is a Web Worker postMessage
protocol (SURVEY.md section 2.24); the TPU-native replacement launches one
process per host, initializes the JAX distributed runtime over DCN, and
builds the ('host', 'chip') mesh the sharded pipeline runs on
(gsplat_tpu/parallel/mesh.py). On a Cloud TPU pod slice all flags are
auto-detected; elsewhere pass coordinator/num_processes/process_id
explicitly.

Usage from a CLI (see ``add_mesh_args`` / ``mesh_from_args``):

    python -m gsplat_tpu.cli.train ... --mesh 2x4 \\
        --coordinator host0:9999 --num_processes 2 --process_id $RANK
"""

from __future__ import annotations

import argparse
from typing import Optional, Tuple

import jax

from gsplat_tpu.parallel.mesh import Mesh, make_mesh

_initialized = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-process JAX runtime (idempotent).

    With no arguments, relies on the TPU pod metadata auto-detection built
    into ``jax.distributed.initialize``. Single-process runs (the common
    case, and every test) never need to call this.
    """
    global _initialized
    # NOTE: do NOT call jax.process_count() here — it initializes the XLA
    # backend, after which jax.distributed.initialize() always raises
    # (ADVICE r2, high). jax.distributed.is_initialized() is backend-safe.
    if _initialized or jax.distributed.is_initialized():
        _initialized = True
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _initialized = True


def parse_mesh_shape(spec: str) -> Tuple[int, int]:
    """'2x4' -> (2, 4); '8' -> (1, 8)."""
    parts = spec.lower().split("x")
    if len(parts) == 1:
        return (1, int(parts[0]))
    if len(parts) != 2:
        raise ValueError(f"mesh spec must be 'HxC' or 'C', got {spec!r}")
    return (int(parts[0]), int(parts[1]))


def add_mesh_args(ap: argparse.ArgumentParser) -> None:
    """Attach the standard distributed/mesh flags to a CLI parser."""
    ap.add_argument("--mesh", default=None,
                    help="device mesh shape 'HOSTSxCHIPS' (e.g. 2x4) or "
                         "'CHIPS'; default: all local devices as (1, n)")
    ap.add_argument("--coordinator", default=None,
                    help="coordinator address host:port for multi-process "
                         "runs (auto-detected on TPU pod slices)")
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)


def mesh_from_args(args: argparse.Namespace) -> Optional[Mesh]:
    """Build the mesh requested by ``add_mesh_args`` flags; None unless
    --mesh or any multi-process flag was given (sharding is opt-in: a
    multi-device host without --mesh still runs the single-device path)."""
    multi = (args.coordinator is not None or args.num_processes is not None
             or args.process_id is not None)
    if multi:
        initialize_distributed(args.coordinator, args.num_processes,
                               args.process_id)
    if args.mesh is not None:
        return make_mesh(parse_mesh_shape(args.mesh))
    if multi:
        return make_mesh()
    return None
