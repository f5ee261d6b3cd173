"""Orbax-backed async/sharded checkpointing (core/orbax_checkpoint.py):
round-trip fidelity, sharding-preserving restore on the 8-device mesh,
retention, and the pickled model sidecar."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ptgnn_tpu.core.orbax_checkpoint import OrbaxCheckpointer


def tree_allclose(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_roundtrip_and_retention(tmp_path):
    import optax

    ckpt = OrbaxCheckpointer(tmp_path / "ckpt", max_to_keep=2)
    params = {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.ones((4,))}
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    for step in (1, 2, 3):
        ckpt.save(step, jax.tree_util.tree_map(lambda x: x * step, params), opt_state)
    ckpt.wait()
    assert ckpt.latest_step() == 3
    p3, o3, s = ckpt.restore(like=params, opt_state_like=opt_state)
    assert s == 3
    tree_allclose(p3, jax.tree_util.tree_map(lambda x: x * 3, params))
    tree_allclose(o3, opt_state)
    # the restored optimizer state keeps optax's pytree STRUCTURE — it must
    # be directly usable in opt.update (a structure-free restore flattens
    # NamedTuples to dicts and breaks .mu access)
    grads = jax.tree_util.tree_map(jnp.ones_like, p3)
    _, o4 = opt.update(grads, o3, p3)
    assert jax.tree_util.tree_structure(o4) == jax.tree_util.tree_structure(opt_state)
    # retention: step 1 evicted, step 2 restorable
    p2, _, _ = ckpt.restore(step=2, like=params, opt_state_like=opt_state)
    tree_allclose(p2, jax.tree_util.tree_map(lambda x: x * 2, params))
    ckpt.close()


def test_sharded_restore_preserves_sharding(tmp_path):
    devices = jax.devices()[:8]
    mesh = Mesh(np.asarray(devices), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    x = jax.device_put(jnp.arange(64.0).reshape(8, 8), sharding)
    ckpt = OrbaxCheckpointer(tmp_path / "ckpt")
    ckpt.save(0, {"x": x}, wait=True)
    restored, _, _ = ckpt.restore(like={"x": x})
    np.testing.assert_allclose(np.asarray(restored["x"]), np.asarray(x))
    assert restored["x"].sharding.is_equivalent_to(sharding, x.ndim)
    ckpt.close()


class _FakeModel:
    """Module-level so it pickles (like a real AbstractNeuralModel)."""

    def __init__(self):
        self.vocab = {"a": 1, "b": 2}


def test_model_sidecar_roundtrip(tmp_path):
    FakeModel = _FakeModel
    ckpt = OrbaxCheckpointer(tmp_path / "ckpt")
    ckpt.save(5, {"w": jnp.ones((2,))}, model=FakeModel(), wait=True)
    m = ckpt.restore_model()
    assert m.vocab == {"a": 1, "b": 2}
    ckpt.close()
