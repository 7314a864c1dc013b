"""World generation + derived-table consistency."""
import numpy as np
import jax.numpy as jnp

from rtvb_tpu.world import gen, voxel
from rtvb_tpu.assets import blocks as B


def test_generate_deterministic():
    cfg, w1 = gen.generate_world()
    _, w2 = gen.generate_world()
    assert np.array_equal(np.asarray(w1.blocks), np.asarray(w2.blocks))
    assert np.asarray(w1.blocks).shape == (64, 32, 64)
    # terrain exists and is not full
    occ = (np.asarray(w1.blocks) != 0).mean()
    assert 0.05 < occ < 0.9


def test_colmask_matches_blocks():
    cfg, w = gen.generate_world()
    blocks = np.asarray(w.blocks)
    mask = np.asarray(w.colmask).reshape(cfg.x, cfg.z)
    for x, z in [(0, 0), (13, 27), (63, 63), (30, 43), (35, 43)]:
        expect = 0
        for y in range(cfg.y):
            if blocks[x, y, z] != 0:
                expect |= 1 << y
        assert mask[x, z] == expect, (x, z)


def test_schema_plus_exceptions_reconstruct_blocks():
    cfg, w = gen.generate_world()
    blocks = np.asarray(w.blocks)
    pred = np.asarray(voxel.predicted_blocks(cfg, w.schema, w.colmask))
    exc_key = np.asarray(w.exc_key)
    exc_id = np.asarray(w.exc_id)
    recon = pred.copy()
    for k, bid in zip(exc_key, exc_id):
        if k >= voxel.EXC_EMPTY:
            continue
        c, y = divmod(int(k), cfg.y)
        x, z = divmod(c, cfg.z)
        recon[x, y, z] = bid
    assert np.array_equal(recon, blocks)


def test_shader_ball_row_present():
    cfg, w = gen.generate_world()
    blocks = np.asarray(w.blocks)
    row = blocks[30:40, 7, 43]
    assert list(row) == list(range(B.SHADERBALL0, B.SHADERBALL0 + 10))
    # they hover (exceptions, since the schema can't predict them there)
    exc_mask = np.asarray(w.exc_mask).reshape(cfg.x, cfg.z)
    assert all(exc_mask[x, 43] >> 7 & 1 for x in range(30, 40))


def test_super_df_zero_on_occupied():
    cfg, w = gen.generate_world()
    df = np.asarray(w.df_super)[0]
    mask = np.asarray(w.colmask).reshape(cfg.x, cfg.z)
    ss = cfg.super_size
    occ_super = (mask != 0).reshape(cfg.super_x, ss, cfg.super_z, ss).any((1, 3))
    for sx in range(cfg.super_x):
        for sz in range(cfg.super_z):
            d = df[sx * cfg.super_z + sz]
            assert (d == 0) == occ_super[sx, sz]


def test_set_block_roundtrip():
    cfg, w = gen.generate_world()
    # place a lantern in the air
    w2 = voxel.set_block(cfg, w, 10, 20, 10, B.LANTERN)
    assert int(w2.blocks[10, 20, 10]) == B.LANTERN
    mask = np.asarray(w2.colmask).reshape(cfg.x, cfg.z)
    assert mask[10, 10] >> 20 & 1
    # it must be an exception (schema says air/terrain ids there)
    keys = [int(k) for k in np.asarray(w2.exc_key) if k < voxel.EXC_EMPTY]
    assert (10 * cfg.z + 10) * cfg.y + 20 in keys
    # delete restores
    w3 = voxel.set_block(cfg, w2, 10, 20, 10, 0)
    assert np.array_equal(np.asarray(w3.blocks), np.asarray(w.blocks))
    assert np.array_equal(np.asarray(w3.exc_key), np.asarray(w.exc_key))


def test_block_id_at_out_of_bounds():
    cfg, w = gen.generate_world()
    v = voxel.block_id_at(cfg, w, jnp.array([-1, 200]), jnp.array([0, 0]), jnp.array([0, 0]))
    assert np.all(np.asarray(v) == 0)


def test_exception_table_grows_on_overflow():
    """Pow2 exception-list growth: 500 deviating placements must ALL be
    renderable from the exception table — no silent schema-block
    degradation (reference: every voxel always exact via dense grid)."""
    from rtvb_tpu.core.config import Settings
    from rtvb_tpu.render.renderer import Engine

    eng = Engine(settings=Settings(), width=96, height=96)
    base_cap = eng.cfg.max_exceptions
    xs, zs = np.meshgrid(np.arange(5, 55), np.arange(5, 15))
    n = xs.size
    xyz = np.stack([xs.ravel(), np.full(n, 28), zs.ravel()], axis=1)
    eng.set_blocks(xyz, np.full(n, B.BRICK, np.uint8))

    n_exc = voxel.exception_count(eng.cfg, eng.world)
    assert n_exc >= n, f"placements not all deviating: {n_exc}"
    assert eng.cfg.max_exceptions >= n_exc > base_cap
    keys = set(int(k) for k in np.asarray(eng.world.exc_key)
               if k < voxel.EXC_EMPTY)
    assert len(keys) == n_exc   # table holds EVERY exception, none dropped
    ids = {int(k): int(i) for k, i in
           zip(np.asarray(eng.world.exc_key), np.asarray(eng.world.exc_id))}
    cfg = eng.cfg
    for x, y, z in xyz:
        key = (int(x) * cfg.z + int(z)) * cfg.y + int(y)
        assert key in keys
        assert ids[key] == B.BRICK
