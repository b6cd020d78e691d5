"""Multi-chip data-parallelism tests on the virtual 8-device CPU mesh.

The reference has no distributed mode at all (SURVEY.md section 2.2);
these tests validate the TPU-native replacement: batch sharded
``P('data')``, state replicated, gradient psum inserted by the XLA SPMD
partitioner, and N-way/1-way numerical equivalence.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tests.conftest import CLASSES, SIZE
from uda_aerial_semantic_segmentation_research_tpu.ops.augment import NONE
from uda_aerial_semantic_segmentation_research_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    global_batch_size,
    replicate,
    shard_batch,
)
from uda_aerial_semantic_segmentation_research_tpu.training import steps as step_lib
from uda_aerial_semantic_segmentation_research_tpu.training.state import (
    TrainState,
    adam,
)

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= N_DEV, "conftest must force an 8-device CPU mesh"
    return create_mesh(jax.devices()[:N_DEV])


def test_mesh_and_shardings(mesh):
    assert mesh.devices.size == N_DEV
    assert mesh.axis_names == ("data",)
    assert global_batch_size(2, mesh) == 16

    batch = np.zeros((16, SIZE, SIZE, 3), np.uint8)
    sharded = shard_batch(batch, mesh)
    assert sharded.sharding == batch_sharding(mesh)
    # each device holds 16/8 = 2 samples
    assert sharded.addressable_shards[0].data.shape[0] == 2

    with pytest.raises(ValueError):
        shard_batch(np.zeros((3, 4), np.float32), mesh)  # 3 % 8 != 0


def test_replicated_state(mesh):
    tree = {"w": jnp.ones((4, 4))}
    rep = replicate(tree, mesh)
    assert rep["w"].sharding.is_fully_replicated


def test_data_parallel_step_runs(seg_bundle, mesh):
    """The SAME step function runs over the 8-device mesh: batch sharded,
    params replicated, loss finite, params stay replicated after update."""
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (N_DEV, SIZE, SIZE, 3)).astype(np.uint8)
    masks = rng.integers(0, CLASSES, (N_DEV, SIZE, SIZE)).astype(np.int32)

    step = step_lib.make_supervised_train_step(seg_bundle.module, CLASSES,
                                               aug_cfg=NONE)
    state = TrainState.from_bundle(seg_bundle, adam(1e-3))
    state = replicate(state, mesh)
    key = jax.device_put(jax.random.key(0), NamedSharding(mesh, P()))

    state, metrics = step(state, key, shard_batch(images, mesh),
                          shard_batch(masks, mesh))
    assert np.isfinite(float(metrics["loss"]))
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_data_parallel_matches_single_device(seg_bundle):
    """8-way sharded step == single-device step on the same global batch:
    the partitioner's gradient psum must equal the global-batch gradient.
    SGD updates = -lr * grad, so params compare gradients directly (Adam
    would amplify reduction-order float noise on near-zero grads into
    +-lr sign flips)."""
    import optax

    rng = np.random.default_rng(1)
    images = rng.integers(0, 255, (N_DEV, SIZE, SIZE, 3)).astype(np.uint8)
    masks = rng.integers(0, CLASSES, (N_DEV, SIZE, SIZE)).astype(np.int32)
    step = step_lib.make_supervised_train_step(seg_bundle.module, CLASSES,
                                               aug_cfg=NONE)
    key = jax.random.key(3)

    # single device
    s1 = TrainState.from_bundle(seg_bundle, optax.sgd(0.1))
    s1, m1 = step(s1, key, images, masks)

    # 8-device mesh
    mesh = create_mesh(jax.devices()[:N_DEV])
    s8 = replicate(TrainState.from_bundle(seg_bundle, optax.sgd(0.1)), mesh)
    k8 = jax.device_put(key, NamedSharding(mesh, P()))
    s8, m8 = step(s8, k8, shard_batch(images, mesh), shard_batch(masks, mesh))

    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-4
    # atol: ~1e-3-scale gradient reduction-order noise x lr 0.1.  The
    # lane-folded BN sums (ops/lane_bn.py) associate differently under
    # sharding than on one device; their stats are shard-exact to f32
    # ulp (mean ~5e-9 at this shape), but one ulp through bf16
    # activations can flip a bf16 rounding and perturb large-sum grads
    # at ~1e-3.  Semantic sharding bugs (per-shard instead of global
    # stats) sit at 1e-2+ and still fail.
    for p1, p8 in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p8),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_graft_entry_dryrun():
    """The driver's multichip dry run must pass on the virtual mesh."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __graft_entry__ as graft

    graft.dryrun_multichip(N_DEV)


@pytest.mark.slow
def test_graft_entry_dryrun_survives_broken_default_backend():
    """Regression for MULTICHIP_r01 ok:false: the dry run must never
    dispatch on the default backend.  Run it in a subprocess whose
    default platform (tpu) is deliberately absent -- jax.devices()
    raises, and every computation must land on the CPU fallback mesh."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # drop any sitecustomize backend injection
    env["JAX_PLATFORMS"] = "tpu"  # no TPU plugin here: backend init raises
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    proc = subprocess.run(
        [sys.executable, str(repo / "__graft_entry__.py"), "8"],
        capture_output=True, text=True, timeout=600, env=env, cwd=repo)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK" in proc.stdout


def test_graft_entry_forward_compiles():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __graft_entry__ as graft
    from uda_aerial_semantic_segmentation_research_tpu.config import Config

    # conftest shrinks Config so this stays CPU-friendly
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[2].shape[0]


@pytest.mark.slow
def test_trainer_engages_mesh(workspace):
    """SegmentationTrainer auto-shards when batch divides the device
    count (the end-to-end multi-chip training path)."""
    import os

    import jax.numpy as jnp

    from uda_aerial_semantic_segmentation_research_tpu.config import Config
    from uda_aerial_semantic_segmentation_research_tpu.data.dataset import (
        DroneDataset,
        random_split,
    )
    from uda_aerial_semantic_segmentation_research_tpu.data.loader import (
        DataLoader,
    )
    from uda_aerial_semantic_segmentation_research_tpu.models import create_unet
    from uda_aerial_semantic_segmentation_research_tpu.training import (
        SegmentationTrainer,
    )

    from uda_aerial_semantic_segmentation_research_tpu.data.dataset import (
        WeightedRandomSampler,
    )

    Config.LOG_INTERVAL = 1000
    ds = DroneDataset(
        images_dir=os.path.join(Config.SAMPLE_DATA_DIR, "original_images"),
        masks_dir=os.path.join(Config.SAMPLE_DATA_DIR, "label_images_semantic"),
        verbose=False)
    train_ds, val_ds = random_split(ds, [4, 2], seed=0)
    # sample-with-replacement to a batch of 8 = 1 sample per virtual chip
    sampler = WeightedRandomSampler(np.ones(len(train_ds)), num_samples=8,
                                    seed=0)
    loader = DataLoader(train_ds, batch_size=8, sampler=sampler,
                        drop_last=True)
    val_loader = DataLoader(val_ds, batch_size=2)

    bundle = create_unet(encoder_name="resnet18", classes=23, image_size=SIZE,
                         encoder_weights=None, dtype=jnp.float32)
    trainer = SegmentationTrainer(bundle, "cpu")
    trainer.train(loader, val_loader, epochs=1, learning_rate=1e-3)
    assert trainer._mesh is not None, "mesh should have engaged at batch 8"


def test_adversarial_step_matches_single_device(seg_bundle, disc_bundle):
    """8-way sharded fused D-then-G step == single-device on the same
    global batch (dual TrainStates: both gradient psums + both models'
    BatchNorm cross-replica stats must line up)."""
    import optax

    from uda_aerial_semantic_segmentation_research_tpu.training.state import (
        AdversarialState,
    )

    rng = np.random.default_rng(4)
    src = rng.integers(0, 255, (N_DEV, SIZE, SIZE, 3)).astype(np.uint8)
    msk = rng.integers(0, CLASSES, (N_DEV, SIZE, SIZE)).astype(np.int32)
    tgt = rng.integers(0, 255, (N_DEV, SIZE, SIZE, 3)).astype(np.uint8)
    step = step_lib.make_adversarial_train_step(
        seg_bundle.module, disc_bundle.module, CLASSES, aug_cfg=NONE)
    key = jax.random.key(5)

    def fresh():
        return AdversarialState(
            seg=TrainState.from_bundle(seg_bundle, optax.sgd(0.1)),
            disc=TrainState.from_bundle(disc_bundle, optax.sgd(0.1)))

    s1, m1 = step(fresh(), key, src, msk, tgt)

    mesh = create_mesh(jax.devices()[:N_DEV])
    k8 = jax.device_put(key, NamedSharding(mesh, P()))
    s8, m8 = step(replicate(fresh(), mesh), k8, shard_batch(src, mesh),
                  shard_batch(msk, mesh), shard_batch(tgt, mesh))

    for name in ("loss", "d_loss", "seg_loss"):
        assert abs(float(m1[name]) - float(m8[name])) < 1e-4, name
    for p1, p8 in zip(jax.tree.leaves((s1.seg.params, s1.disc.params)),
                      jax.tree.leaves((s8.seg.params, s8.disc.params))):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p8),
                                   atol=1e-5, rtol=1e-4)
    assert jax.tree.leaves(s8.disc.params)[0].sharding.is_fully_replicated


def test_grl_step_matches_single_device():
    """8-way sharded single-pass GRL step == single-device: the
    gradient-reversal custom_vjp, the feature-level discriminator's
    cross-replica BatchNorm, and the joint seg+domain gradient psum all
    under SPMD sharding (completes mesh coverage of all four step
    families)."""
    import optax

    from uda_aerial_semantic_segmentation_research_tpu.models import (
        create_uda_model,
    )

    bundle = create_uda_model(encoder_name="resnet18", classes=CLASSES,
                              image_size=SIZE, dtype=jnp.float32)
    rng = np.random.default_rng(11)
    src = rng.integers(0, 255, (N_DEV, SIZE, SIZE, 3)).astype(np.uint8)
    msk = rng.integers(0, CLASSES, (N_DEV, SIZE, SIZE)).astype(np.int32)
    tgt = rng.integers(0, 255, (N_DEV, SIZE, SIZE, 3)).astype(np.uint8)
    step = step_lib.make_grl_train_step(bundle.module, CLASSES, aug_cfg=NONE)
    key = jax.random.key(12)
    alpha = jnp.float32(0.5)

    def fresh():
        return TrainState.from_bundle(bundle, optax.sgd(0.1))

    s1, m1 = step(fresh(), key, src, msk, tgt, alpha)

    mesh = create_mesh(jax.devices()[:N_DEV])
    k8 = jax.device_put(key, NamedSharding(mesh, P()))
    s8, m8 = step(replicate(fresh(), mesh), k8, shard_batch(src, mesh),
                  shard_batch(msk, mesh), shard_batch(tgt, mesh), alpha)

    for name in ("loss", "seg_loss", "domain_loss", "domain_acc"):
        assert abs(float(m1[name]) - float(m8[name])) < 1e-4, name
    for p1, p8 in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p8),
                                   atol=1e-5, rtol=1e-4)
    assert jax.tree.leaves(s8.params)[0].sharding.is_fully_replicated

    # the PRODUCTION sequential decomposition under the same mesh: the
    # cross-program carries (augmented views sharded, grads/stats
    # replicated) must preserve the single-device update too
    seq = step_lib.make_grl_sequential_step(bundle.module, CLASSES,
                                            aug_cfg=NONE)
    sq1, q1 = seq(fresh(), key, src, msk, tgt, alpha)
    sq8, q8 = seq(replicate(fresh(), mesh), k8, shard_batch(src, mesh),
                  shard_batch(msk, mesh), shard_batch(tgt, mesh), alpha)
    for name in ("loss", "seg_loss", "domain_loss", "domain_acc"):
        assert abs(float(q1[name]) - float(q8[name])) < 1e-4, name
    for p1, p8 in zip(jax.tree.leaves(sq1.params),
                      jax.tree.leaves(sq8.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p8),
                                   atol=1e-5, rtol=1e-4)
    assert jax.tree.leaves(sq8.params)[0].sharding.is_fully_replicated


def test_unsupervised_step_matches_single_device(seg_bundle, disc_bundle):
    """8-way sharded phase-3 step == single-device: dict-pytree params
    {seg, disc}, joint gradient, and the in-step finite guard all under
    SPMD sharding."""
    import optax

    from uda_aerial_semantic_segmentation_research_tpu.ops.losses import (
        FineTuningLoss,
    )

    rng = np.random.default_rng(6)
    tgt = rng.integers(0, 255, (N_DEV, SIZE, SIZE, 3)).astype(np.uint8)
    step = step_lib.make_unsupervised_train_step(
        seg_bundle.module, disc_bundle.module, CLASSES, FineTuningLoss(),
        aug_cfg=NONE)
    key = jax.random.key(8)

    def fresh():
        tx = optax.sgd(0.1)
        params = jax.tree.map(jnp.array, {"seg": seg_bundle.params,
                                          "disc": disc_bundle.params})
        stats = jax.tree.map(jnp.array, {"seg": seg_bundle.batch_stats,
                                         "disc": disc_bundle.batch_stats})
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          batch_stats=stats, opt_state=tx.init(params), tx=tx)

    s1, m1 = step(fresh(), key, tgt, jnp.float32(1.0))

    mesh = create_mesh(jax.devices()[:N_DEV])
    k8 = jax.device_put(key, NamedSharding(mesh, P()))
    s8, m8 = step(replicate(fresh(), mesh), k8, shard_batch(tgt, mesh),
                  jnp.float32(1.0))

    assert bool(m1["finite"]) and bool(m8["finite"])
    assert abs(float(m1["total"]) - float(m8["total"])) < 1e-4
    for p1, p8 in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p8),
                                   atol=1e-5, rtol=1e-4)


def test_unsupervised_sequential_matches_single_device(seg_bundle,
                                                       disc_bundle):
    """8-way sharded SEQUENTIAL phase-3 step == single-device.

    The memory decomposition runs as several jit programs with device-
    resident intermediates (views, logits) crossing program boundaries;
    under a mesh each sub-program is SPMD-partitioned independently and
    the carried buffers keep their batch sharding -- this asserts the
    whole chain still reproduces the single-device update."""
    import optax

    from uda_aerial_semantic_segmentation_research_tpu.ops.losses import (
        FineTuningLoss,
    )

    rng = np.random.default_rng(9)
    tgt = rng.integers(0, 255, (N_DEV, SIZE, SIZE, 3)).astype(np.uint8)
    step = step_lib.make_unsupervised_sequential_step(
        seg_bundle.module, disc_bundle.module, CLASSES, FineTuningLoss(),
        aug_cfg=NONE)
    key = jax.random.key(8)

    def fresh():
        tx = optax.sgd(0.1)
        params = jax.tree.map(jnp.array, {"seg": seg_bundle.params,
                                          "disc": disc_bundle.params})
        stats = jax.tree.map(jnp.array, {"seg": seg_bundle.batch_stats,
                                         "disc": disc_bundle.batch_stats})
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          batch_stats=stats, opt_state=tx.init(params), tx=tx)

    s1, m1 = step(fresh(), key, tgt, jnp.float32(1.0))

    mesh = create_mesh(jax.devices()[:N_DEV])
    k8 = jax.device_put(key, NamedSharding(mesh, P()))
    s8, m8 = step(replicate(fresh(), mesh), k8, shard_batch(tgt, mesh),
                  jnp.float32(1.0))

    assert bool(m1["finite"]) and bool(m8["finite"])
    assert abs(float(m1["total"]) - float(m8["total"])) < 1e-4
    for p1, p8 in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p8),
                                   atol=1e-5, rtol=1e-4)


def test_spatial_partition_matches_single_device(seg_bundle):
    """Height-sharded forward == single-device forward (halo exchange
    inserted by the SPMD partitioner reproduces exact receptive fields)."""
    from uda_aerial_semantic_segmentation_research_tpu.parallel.spatial import (
        spatial_forward,
        spatial_mesh,
    )

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (2, SIZE, SIZE, 3)).astype(np.float32))

    ref = seg_bundle.module.apply(seg_bundle.variables, x, train=False)

    mesh = spatial_mesh(2, 4)            # 2-way batch x 4-way height
    out = spatial_forward(seg_bundle.module, seg_bundle.variables, x, mesh)
    assert out.sharding.spec == P("data", "space")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_spatial_partition_dilated_decoder(seg_bundle):
    """A dilated-decoder module passed to the spatial path must still
    reproduce the single-device forward.

    Raw lhs_dilation=2 windows are NOT height-shardable: the SPMD
    partitioner mis-phases them over small shards (measured ~7e-3 abs
    error over 99% of outputs at the /32 feature level), so
    spatial_forward swaps the module to the naive decoder schedule
    (identical parameters) before sharding -- this pins that guard."""
    from uda_aerial_semantic_segmentation_research_tpu.parallel.spatial import (
        spatial_forward,
        spatial_mesh,
    )

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (2, SIZE, SIZE, 3)).astype(np.float32))

    module = seg_bundle.module.clone(fused_decoder="dilated")
    ref = seg_bundle.module.clone(fused_decoder=False).apply(
        seg_bundle.variables, x, train=False)

    mesh = spatial_mesh(2, 4)
    out = spatial_forward(module, seg_bundle.variables, x, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_supervised_dilated_matches_single_device(seg_bundle):
    """8-way data-parallel supervised step with the TPU production
    decoder (fused_decoder="dilated"): batch sharding carries no conv
    window, so the dilated schedule must be exactly shardable (unlike
    the height-sharded case above)."""
    import optax

    module = seg_bundle.module.clone(fused_decoder="dilated")
    step = step_lib.make_supervised_train_step(module, CLASSES, aug_cfg=NONE)

    rng = np.random.default_rng(7)
    images = rng.integers(0, 255, (N_DEV, SIZE, SIZE, 3)).astype(np.uint8)
    masks = rng.integers(0, CLASSES, (N_DEV, SIZE, SIZE)).astype(np.int32)
    key = jax.random.key(3)

    s1 = TrainState.from_bundle(seg_bundle, optax.sgd(0.1))
    s1, m1 = step(s1, key, images, masks)

    mesh = create_mesh(jax.devices()[:N_DEV])
    s8 = replicate(TrainState.from_bundle(seg_bundle, optax.sgd(0.1)), mesh)
    k8 = jax.device_put(key, NamedSharding(mesh, P()))
    s8, m8 = step(s8, k8, shard_batch(images, mesh), shard_batch(masks, mesh))

    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-4
    for p1, p8 in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p8),
                                   atol=1e-5, rtol=1e-4)
