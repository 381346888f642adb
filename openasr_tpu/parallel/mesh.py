"""Device mesh + sharding rules: the framework's distributed backend.

This replaces the reference's entire parallelism story — single-process
`torch.nn.DataParallel` with replica scatter/gather per forward
(reference: src/train.py:132-134, src/solvers/__init__.py:16-19) — with
JAX GSPMD over a (data, model) mesh:

  * batches are sharded on the 'data' axis (ICI all-reduce for gradients,
    inserted by XLA);
  * parameters are optionally tensor-sharded on the 'model' axis
    (attention heads / FFN hidden), replicated otherwise;
  * multi-host runs use the same code after `jax.distributed.initialize`.

The samplers' batch-divisibility knob (reference: samplers.py:21-31, ngpu)
maps to the mesh's data-axis size.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
PIPE_AXIS = "pipe"


def _default_devices():
    """Devices of the platform computations actually target.  Plain
    `jax.devices()` is wrong under the experimental 'axon' TPU plugin,
    which stays the default backend even when JAX_PLATFORMS=cpu /
    jax_default_device pins CPU — building the mesh from it would silently
    route every jitted step through the device tunnel."""
    from openasr_tpu.kernels import default_platform

    try:
        return jax.devices(default_platform())
    except RuntimeError:
        return jax.devices()


def make_mesh(
    devices=None, data: Optional[int] = None, model: int = 1, pipe: int = 1
) -> Mesh:
    """Build a (data, model) mesh — or (pipe, data, model) when pipe > 1 —
    over the given devices (default: all devices of the effective default
    platform).  The pipe axis is outermost so pipeline neighbors sit in
    adjacent mesh rows; it is consumed by the GPipe executor
    (parallel/pipeline.py), everything else (batch/param shardings) simply
    replicates across it."""
    devices = list(devices if devices is not None else _default_devices())
    n = len(devices)
    if data is None:
        assert n % (model * pipe) == 0, (
            f"{n} devices not divisible by model={model} x pipe={pipe}"
        )
        data = n // (model * pipe)
    assert data * model * pipe == n, (
        f"mesh {pipe}x{data}x{model} != {n} devices"
    )
    if pipe > 1:
        arr3 = np.array(devices).reshape(pipe, data, model)
        procs3 = np.array(
            [[[d.process_index for d in row] for row in sl] for sl in arr3]
        )
        if len(set(procs3.flat)) > 1:
            raise ValueError(
                "pipeline-parallel meshes are single-host for now: the "
                "GPipe executor's ppermute ring has no multi-host batch "
                f"plan; got process layout {procs3.tolist()}"
            )
        if n > 1:
            from openasr_tpu import kernels

            kernels.set_spmd_partitioning(True)
        return Mesh(arr3, (PIPE_AXIS, DATA_AXIS, MODEL_AXIS))
    arr = np.array(devices).reshape(data, model)
    _validate_multihost_layout(
        np.array([[d.process_index for d in row] for row in arr])
    )
    # >1-device meshes need the Pallas kernels' SPMD partitioning rules
    # (otherwise GSPMD all-gathers around each kernel).  The flag is
    # STICKY-ON: a later 1-device mesh (bench/profiling utilities build
    # them) must not silently disable the rules for an existing
    # multi-device mesh — the next retrace would bring the all-gathers
    # back with no warning.  Single-device-only processes never set it
    # and skip the wrapper's custom-call overhead (kernels/partition.py).
    if n > 1:
        from openasr_tpu import kernels

        kernels.set_spmd_partitioning(True)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _validate_multihost_layout(procs: np.ndarray) -> None:
    """Reject multi-host mesh layouts the host-side batch plan cannot
    serve, with a clear error instead of an opaque shard-shape crash deep
    in `make_array_from_callback`.

    `_shard_batch_multihost` (and the loader's rank/world row slicing)
    assumes host r of w owns the process-contiguous block of data-axis
    rows [r*data/w, (r+1)*data/w) — so (a) a tensor-parallel group (one
    mesh row) may not span hosts, (b) the data axis must divide evenly by
    the process count, and (c) each host's rows must be contiguous.
    procs: [data, model] array of device process indices."""
    nproc = len(set(procs.flat))
    if nproc <= 1:
        return
    data = procs.shape[0]
    if any(len(set(row)) != 1 for row in procs):
        raise ValueError(
            "model-parallel groups may not span hosts: each mesh row (one "
            "tensor-parallel group of the (data, model) mesh) must live on "
            f"a single process, got process layout {procs.tolist()}. Use "
            "--model-parallel <= devices per host."
        )
    if data % nproc != 0:
        raise ValueError(
            f"data axis ({data}) must divide evenly across the "
            f"{nproc} host processes for per-host batch row slicing"
        )
    k = data // nproc
    row_proc = procs[:, 0]
    if any(len(set(row_proc[i * k:(i + 1) * k])) != 1 for i in range(nproc)):
        raise ValueError(
            "data-axis rows must be process-contiguous (host r owns rows "
            f"[r*{k}, (r+1)*{k})); got per-row processes {row_proc.tolist()}"
        )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def _mesh_process_count(mesh: Mesh) -> int:
    return len({d.process_index for d in mesh.devices.flat})


def mesh_process_count(mesh: Mesh) -> int:
    """Number of processes participating in this mesh."""
    return _mesh_process_count(mesh)


def mesh_process_index(mesh: Mesh) -> int:
    """THIS host's process index relative to the mesh's own backend.
    `jax.process_index()` consults the DEFAULT backend, which under a
    foreign accelerator plugin (e.g. a single-process device tunnel) can
    disagree with the backend the mesh actually runs on."""
    d = next(iter(mesh.devices.flat))
    return d.client.process_index()


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """device_put each array field with batch-dim sharding; non-arrays
    (uttids) pass through.

    Multi-host: each process passes its LOCAL batch rows (see
    data/loader.py rank/world); the global array is assembled with
    `make_array_from_process_local_data` — global batch = local batch x
    process count.  Per-host padded shapes can disagree by a quantization
    bucket (each host collates its own slice), so non-batch dims are first
    reconciled to the cross-host max via one tiny shape all-gather; the
    extra padding is masked by the length fields like any other padding.
    """
    nproc = _mesh_process_count(mesh)
    if nproc > 1:
        return _shard_batch_multihost(batch, mesh, nproc)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim"):
            out[k] = jax.device_put(v, batch_sharding(mesh, v.ndim))
        else:
            out[k] = v
    return out


_gather_cache: dict = {}


def _allgather_host_data(mesh: Mesh, local: np.ndarray) -> np.ndarray:
    """All-gather one small per-host array across the mesh's processes,
    returning [nproc, *local.shape] on every host.  Built directly on the
    mesh's own devices (one per process) — `multihost_utils` and
    `xla_bridge.process_count()` consult the DEFAULT backend, which under
    a foreign accelerator plugin can be a single-process device tunnel.

    The replicating jit is cached per (mesh, shape, dtype): jit keys on
    function identity, so a fresh lambda per call would retrace + recompile
    every time — this runs on hot paths (per-batch shape reconciliation,
    periodic preemption checks)."""
    key = (mesh, local.shape, str(local.dtype))
    entry = _gather_cache.get(key)
    if entry is None:
        by_proc = {}
        for d in mesh.devices.flat:
            by_proc.setdefault(d.process_index, d)
        devs = [by_proc[p] for p in sorted(by_proc)]
        m1 = Mesh(np.array(devs), ("p",))
        sharding = NamedSharding(m1, P("p"))
        rep_fn = jax.jit(lambda x: x, out_shardings=NamedSharding(m1, P()))
        if len(_gather_cache) > 64:
            _gather_cache.clear()
        entry = _gather_cache[key] = (len(devs), sharding, rep_fn)
    nproc, sharding, rep_fn = entry
    gshape = (nproc,) + local.shape
    # callback receives GLOBAL indices, but this process's only
    # addressable shard is always its own single row
    g = jax.make_array_from_callback(
        gshape, sharding, lambda idx: local[None]
    )
    return np.asarray(rep_fn(g))


def _shard_batch_multihost(batch: dict, mesh: Mesh, nproc: int) -> dict:
    keys = sorted(k for k, v in batch.items() if hasattr(v, "ndim"))
    # one shape vector per host (fixed layout: key-sorted, 8 dims max)
    local_shapes = np.zeros((len(keys), 8), np.int32)
    for i, k in enumerate(keys):
        s = batch[k].shape
        local_shapes[i, : len(s)] = s
    all_shapes = _allgather_host_data(mesh, local_shapes)  # [P, K, 8]
    global_dims = all_shapes.max(axis=0)

    out = {k: v for k, v in batch.items() if not hasattr(v, "ndim")}
    for i, k in enumerate(keys):
        v = np.asarray(batch[k])
        tgt = tuple(int(d) for d in global_dims[i, : v.ndim])
        assert tgt[0] == v.shape[0], (
            f"{k}: per-host batch dims differ ({v.shape[0]} vs {tgt[0]}) — "
            "every host must load the same local batch size"
        )
        if tgt != v.shape:
            v = np.pad(v, [(0, t - s) for s, t in zip(v.shape, tgt)])
        sharding = batch_sharding(mesh, v.ndim)
        global_shape = (v.shape[0] * nproc,) + v.shape[1:]
        # assemble the global array from local rows: callback indices are
        # GLOBAL; this host's rows start at the minimum row any of its
        # addressable devices owns
        imap = sharding.devices_indices_map(global_shape)
        offset = min(
            (imap[d][0].start or 0) for d in sharding.addressable_devices
        )

        def cb(idx, v=v, offset=offset):
            r = idx[0]
            lo = (r.start or 0) - offset
            hi = (r.stop if r.stop is not None else offset + v.shape[0]) - offset
            return v[(slice(lo, hi),) + tuple(idx[1:])]

        out[k] = jax.make_array_from_callback(global_shape, sharding, cb)
    return out


# ------------------------------------------------------- parameter sharding

def _tp_entries(names, ndim: int) -> list:
    """Tensor-parallel axis entries (length ndim, None = replicated) for
    one leaf identified by its param-tree path names.

    Megatron-style: attention head dims and FFN hidden dims shard over
    'model'; embeddings shard over the vocab dim; everything else
    replicates.  XLA/GSPMD inserts the matching collectives.
    """
    joined = "/".join(names)
    e: list = [None] * ndim
    if "self_attn" in joined or "cross_attn" in joined:
        if names[-1] == "kernel":
            if any(n in ("q", "k", "v") for n in names) and ndim >= 2:
                # DenseGeneral [D, H, Dh] -> shard heads
                e[ndim - 2] = MODEL_AXIS
            elif "out" in names and ndim >= 1:
                # DenseGeneral [H, Dh, D] -> shard heads
                e[0] = MODEL_AXIS
        elif names[-1] == "bias" and any(n in ("q", "k", "v") for n in names):
            if ndim >= 2:
                e[ndim - 2] = MODEL_AXIS
            elif ndim == 1:
                e[0] = MODEL_AXIS
        return e
    if "ffn" in joined or "linear1" in joined or "linear2" in joined:
        if "linear1" in names and names[-1] == "kernel" and ndim >= 2:
            e[1] = MODEL_AXIS
        elif "linear1" in names and names[-1] == "bias" and ndim >= 1:
            e[0] = MODEL_AXIS
        elif "linear2" in names and names[-1] == "kernel" and ndim >= 1:
            e[0] = MODEL_AXIS
        return e
    if names[-1] == "embedding" and ndim == 2:
        e[0] = MODEL_AXIS
    return e


def _moe_entries(
    names, ndim: int, shape, tp: bool, ep_size: int
) -> Optional[list]:
    """Expert-parallel axis entries for MoE expert tables (models/moe.py):
    w1/w_gate [E, D, F], b1/b_gate [E, F], w2 [E, F, D], b2 [E, D].  The
    expert dim shards over 'data' (each chip stores E/|data| experts — the
    GShard placement matching `shard_experts`); under tensor parallelism
    the FFN inner dim F additionally shards over 'model', exactly like the
    dense FFN's linear1/linear2 (w_gate/b_gate are glu's per-expert slice
    of linear1's second half, so they shard like w1/b1).  The router stays
    replicated (it is tiny and every token needs it).  Returns None for
    non-MoE leaves."""
    tables = ("w1", "b1", "w2", "b2", "w_gate", "b_gate")
    if "moe_ffn" not in names or names[-1] not in tables:
        return None
    e: list = [None] * ndim
    # shard experts only when E divides the data axis (fewer experts than
    # chips keeps the tables replicated — dispatch still works, each chip
    # just holds every expert).  The mismatch (E % data != 0) is warned
    # at solver init (solvers/__init__.py, logging.warning — config load
    # cannot know the mesh); here we only pick the layout.
    if ep_size > 1 and ndim >= 1 and shape and shape[0] % ep_size == 0:
        e[0] = DATA_AXIS
    if tp:
        if names[-1] in ("w1", "b1", "w_gate", "b_gate") and ndim >= 2:
            e[ndim - 1] = MODEL_AXIS  # ... F]
        elif names[-1] == "w2" and ndim >= 3:
            e[1] = MODEL_AXIS  # [E, F, D]
    return e


def _spec_for(
    path: tuple, leaf, tp: bool = True, pipe: bool = False, ep: int = 0
) -> P:
    """Partition spec for one param leaf: TP rules (`_tp_entries`) on the
    layer-shaped dims, plus — for leaves living under a stacked layer
    group (`stacked_layers`, the GPipe layout of parallel/pipeline.py) —
    the leading [L] dim sharded over 'pipe' so each stage stores only its
    own layers (the TP rules then apply at their usual positions within
    each layer, one dim to the right)."""
    names = [
        str(getattr(p, "key", getattr(p, "name", str(p)))) for p in path
    ]
    ndim = getattr(leaf, "ndim", 0)
    stacked = "stacked_layers" in names
    eff = ndim - 1 if stacked else ndim
    shape = tuple(getattr(leaf, "shape", ()))
    entries = _moe_entries(
        names, eff, shape[1:] if stacked else shape, tp, ep
    )
    if entries is None:
        entries = _tp_entries(names, eff) if tp else [None] * eff
    if stacked:
        entries = [PIPE_AXIS if pipe else None] + entries
    while entries and entries[-1] is None:
        entries.pop()  # P(None, None) and P() are equivalent; emit P()
    return P(*entries)


def zero1_sharding(leaf, mesh: Mesh) -> Optional[NamedSharding]:
    """ZeRO-1 sharding for one optimizer-state leaf: extend the leaf's
    CURRENT sharding (inherited from the parameter — replicated, or
    tensor-parallel over 'model') with 'data'-axis sharding on the largest
    still-unsharded dim whose size divides the data-axis extent.

    Rationale: optimizer moments are pure per-element state — no
    computation ever mixes moment values across elements — so any
    partitioning is semantically free.  Sharding them over the data axis
    cuts the optimizer's HBM footprint and update read/write traffic by
    1/|data| per chip; GSPMD turns the gradient all-reduce feeding the
    update into reduce-scatter + (post-update) all-gather of the deltas —
    the ZeRO-1 / optimizer-state-sharding recipe, expressed purely as a
    placement.  Replaces nothing in the reference (DataParallel keeps full
    optimizer state per replica, src/train.py:132-134); this is the scale
    story the reference never had.

    Returns None when the leaf gains nothing (scalar, no divisible dim,
    data axis of 1) — callers keep the existing placement.
    """
    data = mesh.shape[DATA_AXIS]
    shape = getattr(leaf, "shape", ())
    if data <= 1 or not shape:
        return None
    cur = getattr(leaf, "sharding", None)
    spec = (
        cur.spec if isinstance(cur, NamedSharding) else P()
    )
    entries = list(spec) + [None] * (len(shape) - len(spec))
    if DATA_AXIS in entries:
        # already data-sharded (expert-parallel MoE tables): nothing left
        # for ZeRO-1 to shard on this axis
        return None
    best, best_size = -1, 0
    for i, (dim, used) in enumerate(zip(shape, entries)):
        if used is None and dim % data == 0 and dim > best_size:
            best, best_size = i, dim
    if best < 0:
        return None
    entries[best] = DATA_AXIS
    return NamedSharding(mesh, P(*entries))


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings for the param tree: TP over 'model' when
    the mesh has a model axis > 1, stacked layer groups over 'pipe' when
    it has a pipe axis > 1, MoE expert tables over 'data' when it has a
    data axis > 1 (expert parallelism), fully replicated otherwise."""
    tp = mesh.shape[MODEL_AXIS] > 1
    pipe = dict(mesh.shape).get(PIPE_AXIS, 1) > 1
    ep = mesh.shape[DATA_AXIS]  # expert-parallel degree (size, not bool)
    if not tp and not pipe and ep <= 1:
        return jax.tree_util.tree_map(lambda _: replicated(mesh), params)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, _spec_for(path, leaf, tp=tp, pipe=pipe, ep=ep)
        ),
        params,
    )


def device_put_global(x, sharding: NamedSharding):
    """device_put that also works when `sharding` spans other hosts'
    devices (plain jax.device_put rejects cross-host placement of a
    host-local array).  Every host must hold the full value (true for
    deterministic init and for checkpoints read by every host); the
    global array is assembled from each host's addressable shards."""
    if _mesh_process_count(sharding.mesh) == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


# -------------------------------------------------- sequence parallelism

_SEQ_MESH: Optional[Mesh] = None


def set_sequence_parallel(mesh: Optional[Mesh]) -> None:
    """Enable (mesh) / disable (None) sequence-parallel activation
    sharding for code traced AFTER this call (see `shard_time`)."""
    global _SEQ_MESH
    _SEQ_MESH = mesh


class sequence_parallel:
    """Context manager scoping `set_sequence_parallel` to one trace —
    solvers wrap their jitted-step calls with it so each solver's steps
    bake ITS mesh's constraints regardless of construction order."""

    def __init__(self, mesh: Optional[Mesh]):
        self.mesh = mesh

    def __enter__(self):
        global _SEQ_MESH
        self.prev = _SEQ_MESH
        _SEQ_MESH = self.mesh

    def __exit__(self, *exc):
        global _SEQ_MESH
        _SEQ_MESH = self.prev


def shard_time(x):
    """Megatron-style sequence parallelism, expressed as one placement
    constraint: pin [B, T, ...] activations to T-sharding over the
    'model' axis in the pointwise-in-T regions of the transformer (the
    residual adds / dropout / LayerNorm between attention and FFN
    blocks).  GSPMD then derives the Megatron collective pattern — the
    TP matmuls' forward all-reduce splits into reduce-scatter (back to
    T-shards) + all-gather (before the next QKV/FFN1 matmul), same
    bytes on the wire, while the residual stream, LayerNorms, and
    dropouts hold and touch only T/|model| rows per chip.  That divides
    the non-matmul activation footprint by the TP degree — the lever
    for long-utterance training on top of `encoder.remat`.

    No-op (returns x unchanged) unless a trace runs under
    `sequence_parallel(mesh)` with a >1 'model' axis and both the batch
    and time dims divide their axis extents — so single-device code,
    KV-cached decode steps (T=1), and pure-DP meshes never pay for it.
    """
    mesh = _SEQ_MESH
    if mesh is None or getattr(x, "ndim", 0) < 3:
        return x
    tp = mesh.shape[MODEL_AXIS]
    if (
        tp <= 1
        or x.shape[1] % tp != 0
        or x.shape[0] % mesh.shape[DATA_AXIS] != 0
    ):
        return x
    spec = P(DATA_AXIS, MODEL_AXIS, *([None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


# -------------------------------------------------- expert parallelism

_EXPERT_MESH: Optional[Mesh] = None


def set_expert_parallel(mesh: Optional[Mesh]) -> None:
    """Enable (mesh) / disable (None) expert-parallel activation sharding
    for code traced AFTER this call (see `shard_experts`)."""
    global _EXPERT_MESH
    _EXPERT_MESH = mesh


class expert_parallel:
    """Context manager scoping `set_expert_parallel` to one trace —
    solvers wrap their jitted-step calls with it (alongside
    `sequence_parallel`) so each solver's steps bake ITS mesh's
    constraints regardless of construction order."""

    def __init__(self, mesh: Optional[Mesh]):
        self.mesh = mesh

    def __enter__(self):
        global _EXPERT_MESH
        self.prev = _EXPERT_MESH
        _EXPERT_MESH = self.mesh

    def __exit__(self, *exc):
        global _EXPERT_MESH
        _EXPERT_MESH = self.prev


def shard_experts(x, from_tokens: bool = False):
    """Expert parallelism (GShard), expressed as placement constraints:
    pin the dispatched-activation tensors [E, B, C, D] of a MoE layer
    (models/moe.py) to E-sharding over the 'data' axis — the same axis
    the expert weight tables [E, ...] shard on (`_spec_for`).  With
    tokens batch-sharded on 'data' upstream and downstream, GSPMD derives
    exactly the GShard collective pattern: an all-to-all carrying each
    chip's tokens to the chips holding their experts, and the mirror
    all-to-all bringing expert outputs home — both riding ICI.  Each chip
    stores and computes E/|data| experts.

    `from_tokens=True` marks the tensor as freshly produced FROM
    batch-sharded token tensors (the dispatch einsum's output): it is
    first pinned B-sharded (dim 1) — making the einsum local per chip —
    and then E-sharded, so the reshard between the two pins is forced to
    lower as the dispatch all-to-all.  Without the staged pin GSPMD's
    cost model may instead replicate the (tiny-in-tests) token operands
    via all-gathers, defeating the point of EP
    (tests/test_moe.py:test_ep_dispatch_all_to_all_no_table_gather).

    No-op unless a trace runs under `expert_parallel(mesh)` with a >1
    'data' axis that divides E — so single-device runs, decode, and
    CPU tests never pay for it."""
    mesh = _EXPERT_MESH
    if mesh is None or getattr(x, "ndim", 0) < 2:
        return x
    data = mesh.shape[DATA_AXIS]
    if data <= 1 or x.shape[0] % data != 0:
        return x
    if from_tokens and x.shape[1] % data == 0:
        bspec = P(None, DATA_AXIS, *([None] * (x.ndim - 2)))
        x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, bspec))
    spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def reshard(x, sharding):
    """Move committed (possibly cross-host-sharded) arrays onto new
    shardings ON DEVICE.  Plain `jax.device_put` rejects some cross-host
    transitions and would round-trip through the host for others; an
    identity jit with `out_shardings` lowers to exactly the collective
    resharding XLA would emit mid-program.  `x` may be a pytree with a
    matching pytree of shardings — pass the WHOLE batch of leaves at once
    so they move in one compiled program.  Init/restore-time only — the
    fresh lambda retraces per call, so never use this on a hot path."""
    return jax.jit(lambda a: a, out_shardings=sharding)(x)


def shard_params(params, mesh: Mesh):
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(device_put_global, params, shardings)
