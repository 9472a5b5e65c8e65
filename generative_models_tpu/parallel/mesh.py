"""Device mesh + sharding layer.

The reference has no distributed code at all (gms/main.py:24 picks one CUDA
device). Here parallelism is a first-class subsystem: a jax.sharding.Mesh is
constructed once from the --mesh flag (e.g. 'data:8' or 'data:4,model:2'),
batches are sharded over the 'data' axis, params are replicated (or sharded
over 'model' by models that opt in), and XLA/GSPMD inserts the ICI
collectives. Multi-host runs go through jax.distributed.initialize.
"""

import math
import os
import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'
SEQ_AXIS = 'seq'

_GLOBAL_MESH = None


def parse_mesh_spec(spec, n_devices):
    """'data:4,model:2' -> (('data', 4), ('model', 2)). '' -> all devices on
    the data axis."""
    if not spec:
        return ((DATA_AXIS, n_devices),)
    axes = []
    for part in spec.split(','):
        name, size = part.split(':')
        axes.append((name.strip(), int(size)))
    total = math.prod(s for _, s in axes)
    assert total == n_devices, f'mesh {spec} needs {total} devices, have {n_devices}'
    return tuple(axes)


def make_mesh(spec='', devices=None):
    """Build a Mesh over the given devices (default: all)."""
    devices = devices if devices is not None else jax.devices()
    axes = parse_mesh_spec(spec, len(devices))
    names = tuple(n for n, _ in axes)
    sizes = tuple(s for _, s in axes)
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def get_mesh():
    """Process-global mesh (built lazily on first use; defaults to one
    all-'data' axis). Non-default meshes are installed up front via
    set_mesh(make_mesh(spec)) — main.py:88, serve.py:321 — NOT here: a
    spec parameter on the lazy getter would be silently ignored whenever
    something (e.g. the data loader) touched the mesh first."""
    global _GLOBAL_MESH
    if _GLOBAL_MESH is None:
        _GLOBAL_MESH = make_mesh()
    return _GLOBAL_MESH


def set_mesh(mesh):
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh


def batch_sharding(mesh=None, ndim=4, batch_dim=0):
    """NamedSharding that splits the batch axis (`batch_dim`) over the data
    axis and replicates the rest (batch_dim=1 for (steps, bs, ...) stacked
    epoch/chunk blocks)."""
    mesh = mesh or get_mesh()
    if DATA_AXIS in mesh.axis_names:
        spec = [None] * ndim
        spec[batch_dim] = DATA_AXIS
        return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P(*([None] * ndim)))


def replicated(mesh=None):
    mesh = mesh or get_mesh()
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh=None):
    """Place a batch pytree with its leading axis sharded over 'data'."""
    mesh = mesh or get_mesh()

    def _shard(x):
        return jax.device_put(x, batch_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(_shard, batch)


def replicate(tree, mesh=None):
    mesh = mesh or get_mesh()
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def constrain(x, *axes, mesh=None):
    """with_sharding_constraint by axis NAMES, ignoring axes the current
    mesh doesn't have — models sprinkle these freely ('data' on batch,
    'model' on heads/hidden features) and they become no-ops on meshes
    without those axes (e.g. single chip)."""
    mesh = mesh or get_mesh()
    # inside a partial-manual shard_map trace (e.g. the pipeline body, manual
    # over 'pipe') constraints must be built from the trace's abstract mesh,
    # whose axis types mark the manual axes — a NamedSharding over the
    # concrete mesh (all-Auto) rejects device-varying values. Manual axes are
    # already physically sharded, so only constrain the Auto ones.
    amesh = jax.sharding.get_abstract_mesh()
    manual = set()
    if not amesh.empty:
        manual = set(getattr(amesh, 'manual_axes', ())) or {
            n
            for n, t in zip(amesh.axis_names, amesh.axis_types)
            if str(t) == 'Manual'
        }
        mesh = amesh
    names = []
    for dim, a in zip(x.shape, axes):
        ok = (
            a in mesh.axis_names
            and a not in manual
            and dim % mesh.shape[a] == 0
        )
        names.append(a if ok else None)  # skip non-divisible dims (e.g. init
        # with batch 1, or sampling with odd grid sizes)
    spec = P(*names)
    if all(s is None for s in spec):
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def constrain_batch(x, mesh=None):
    """with_sharding_constraint pinning axis 0 to the data axis; call inside
    jitted train steps to keep GSPMD from gathering the batch."""
    mesh = mesh or get_mesh()
    if DATA_AXIS not in mesh.axis_names:
        return x
    spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def _path_str(path):
    parts = []
    for p in path:
        if hasattr(p, 'key'):
            parts.append(str(p.key))
        elif hasattr(p, 'name'):
            parts.append(str(p.name))
        elif hasattr(p, 'idx'):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return '/'.join(parts)


def shard_by_rules(tree, rules, mesh=None):
    """Place a pytree with explicit tensor-parallel param shardings.

    rules: [(path_regex, axes_tuple)] — the first regex matching the leaf's
    '/'-joined path wins; axes_tuple is a per-dim mesh-axis name (or None),
    e.g. (None, 'model') for a column-parallel kernel. A rule only applies if
    its length matches the leaf rank, the mesh has every named axis, and each
    sharded dim divides evenly; otherwise the leaf is replicated. Optimizer
    moments mirror param paths, so the same rules shard them identically
    (Megatron-style TP state layout)."""
    mesh = mesh or get_mesh()
    compiled = [(re.compile(pat), axes) for pat, axes in rules]
    rep = NamedSharding(mesh, P())

    def place(path, x):
        s = _path_str(path)
        for pat, axes in compiled:
            if pat.search(s):
                if len(axes) != getattr(x, 'ndim', None):
                    break
                ok = all(
                    a is None
                    or (a in mesh.axis_names and d % mesh.shape[a] == 0)
                    for d, a in zip(x.shape, axes)
                )
                if ok:
                    return jax.device_put(x, NamedSharding(mesh, P(*axes)))
                break
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map_with_path(place, tree)


FSDP_MIN_SIZE = 2 ** 14  # leaves below this stay replicated (biases, norms)


def fsdp_place(tree, rules=(), mesh=None, min_size=FSDP_MIN_SIZE):
    """ZeRO-3-style (FSDP) state placement: shard each large leaf's largest
    data-axis-divisible dim over the 'data' axis. Under GSPMD that is the
    whole of FSDP — XLA all-gathers a sharded param right before its use and
    reduce-scatters its grad, overlapping both with compute (the
    scaling-book recipe); no wrapper modules, no hand-written comms, and
    because optimizer moments mirror param paths the same placement shards
    Adam m/v identically (ZeRO-1/2 fall out for free).

    Composes with tensor parallelism: a leaf matching a TP rule keeps the
    rule's 'model'-axis dims and additionally puts 'data' on its largest
    remaining divisible dim (2-D sharded, Megatron-TP x FSDP). Leaves
    smaller than min_size are replicated — gathering them costs more in
    collective latency than their bytes save in HBM.

    The reference has nothing comparable (single CUDA device,
    gms/main.py:24); this is the framework's params-don't-fit scaling path.
    """
    mesh = mesh or get_mesh()
    n = mesh.shape.get(DATA_AXIS, 1)
    rep = NamedSharding(mesh, P())
    compiled = [(re.compile(pat), axes) for pat, axes in rules]

    def _with_data_axis(shape, axes):
        """Put DATA_AXIS on the largest still-unsharded dim divisible by n
        (None = no such dim)."""
        free = [
            (d, i)
            for i, (d, a) in enumerate(zip(shape, axes))
            if a is None and d % n == 0
        ]
        if not free:
            return None
        d, i = max(free)
        out = list(axes)
        out[i] = DATA_AXIS
        return tuple(out)

    def place(path, x):
        ndim = getattr(x, 'ndim', None)
        if ndim is None:
            return x
        shape = x.shape
        axes = (None,) * ndim
        for pat, taxes in compiled:
            if pat.search(_path_str(path)):
                ok = len(taxes) == ndim and all(
                    a is None
                    or (a in mesh.axis_names and d % mesh.shape[a] == 0)
                    for d, a in zip(shape, taxes)
                )
                if ok:
                    axes = tuple(taxes)
                break
        if n > 1 and x.size >= min_size:
            axes = _with_data_axis(shape, axes) or axes
        if all(a is None for a in axes):
            return jax.device_put(x, rep)
        return jax.device_put(x, NamedSharding(mesh, P(*axes)))

    return jax.tree_util.tree_map_with_path(place, tree)


def maybe_initialize_distributed():
    """Multi-host (DCN) init — no-op unless the standard cluster env vars are
    present. Single-process runs (tests, one chip) skip this."""
    if os.environ.get('JAX_COORDINATOR_ADDRESS'):
        jax.distributed.initialize()
