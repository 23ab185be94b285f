"""Equivalence tests: Pallas fused window attention vs the XLA einsum path.

Runs the kernel in interpret mode (CPU-hermetic, like test_pallas_mbconv).
Checks forward values and all four gradients (q, k, v, dense bias),
including a shape where the window batch is split into multiple chunks so
the d_bias grid-accumulation path is exercised.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semiuhpe_tpu.ops.pallas_window_attention import (_pick_chunk,
                                                      window_attention)


def einsum_reference(q, k, v, bias, scale):
    """The models/tinyvit.py WindowAttention math on D-major
    (H, B, D, N) inputs (the kernel's layout contract)."""
    s = jnp.einsum("hbdn,hbdm->hbnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = s + bias[:, None]
    p = jnp.asarray(jax.nn.softmax(s.astype(jnp.float32), axis=-1), q.dtype)
    out = jnp.einsum("hbnm,hbdm->hbdn", p, v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _make(h, b, n, d, dtype, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(h, b, d, n)), dtype)
    k = jnp.asarray(rng.normal(size=(h, b, d, n)), dtype)
    v = jnp.asarray(rng.normal(size=(h, b, d, n)), dtype)
    bias = jnp.asarray(rng.normal(size=(h, n, n)) * 0.1, jnp.float32)
    return q, k, v, bias


class TestPallasWindowAttention:
    @pytest.mark.parametrize("h,b,n,d", [
        (2, 8, 49, 32),     # stage-2/4-like window shape, single chunk
        (2, 32, 196, 32),   # stage-3-like; _pick_chunk splits -> accumulation
    ])
    def test_forward_matches_einsum(self, h, b, n, d):
        q, k, v, bias = _make(h, b, n, d, jnp.float32)
        scale = d ** -0.5
        ref = einsum_reference(q, k, v, bias, scale)
        got = window_attention(q, k, v, bias, scale, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_multichunk_shape_actually_chunks(self):
        # bwd-shaped picks must chunk so the d_bias grid accumulation is real
        assert _pick_chunk(32, 196, 32, n_io=7, n_tmp=4) < 32

    @pytest.mark.parametrize("b,n,d,itemsize,fwd_g,bwd_g", [
        # TinyViT-21m @224 shapes.  Golden chunks: any cost-model change
        # surfaces here and must be re-validated on hardware.  (D-major
        # slabs are 2-3.3x smaller than the old N-major layout, so the
        # chunks grew accordingly.)
        (160, 196, 32, 2, 20, 10),     # stage 3, bf16 (student batch 160)
        (2560, 49, 32, 2, 80, 40),     # stage 2, bf16 (160 imgs x 16 win)
        (640, 49, 32, 2, 80, 40),      # stage 4, bf16
        (2048, 49, 32, 2, 64, 32),     # teacher b128 stage 2, bf16
        (160, 196, 32, 4, 20, 10),     # stage 3, --dtype float32
        (2560, 49, 32, 4, 64, 32),     # stage 2, float32
    ])
    def test_pick_chunk_respects_scoped_vmem(self, b, n, d, itemsize,
                                             fwd_g, bwd_g):
        """Padded working set must stay under the 16 MiB scoped-vmem limit.

        Regressions this guards (both hit Mosaic compile OOMs, which no
        CPU test can reproduce directly):
        - the pre-padding cost model picked G=160 at stage-2 bf16 shapes
          -> 17.5 MiB scoped allocation;
        - the bf16-hardcoded model picked G=16/64 for float32 inputs
          -> 17.2-18.8 MiB.
        The byte oracle below is written independently: it materializes
        the Mosaic-padded buffer shapes per dtype tile and sums them.
        """
        def tile_padded_bytes(shape2d, width):
            # Mosaic tiles: (16, 128) for 2-byte dtypes, (8, 128) for
            # 4-byte; both minor dims round up to the tile.
            sublane = {2: 16, 4: 8}[width]
            rows = -(-shape2d[0] // sublane) * sublane
            cols = -(-shape2d[1] // 128) * 128
            return rows * cols * width

        for n_io, n_tmp, expect in [(4, 2, fwd_g), (7, 4, bwd_g)]:
            g = _pick_chunk(b, n, d, n_io=n_io, n_tmp=n_tmp,
                            itemsize=itemsize)
            assert g == expect, (b, n, d, itemsize, n_io, g, expect)
            assert b % g == 0
            io_blocks = 2 * n_io * g * tile_padded_bytes((d, n), itemsize)
            tmp_bufs = n_tmp * g * tile_padded_bytes((n, n), 4)
            assert io_blocks + tmp_bufs <= 14 * 2 ** 20

    def test_budget_env_knob_scales_chunk(self, monkeypatch):
        """SEMIUHPE_ATTN_VMEM_MB is the probe's A/B lever on chunk size
        (scripts/attn_probe.py H1): smaller budget -> smaller G; explicit
        bytes_budget still wins over the env."""
        base = _pick_chunk(2560, 49, 32, n_io=4, n_tmp=2, itemsize=2)
        monkeypatch.setenv("SEMIUHPE_ATTN_VMEM_MB", "4")
        small = _pick_chunk(2560, 49, 32, n_io=4, n_tmp=2, itemsize=2)
        assert small < base
        explicit = _pick_chunk(2560, 49, 32, n_io=4, n_tmp=2, itemsize=2,
                               bytes_budget=13 * 2 ** 20)
        assert explicit == base

    def test_compiler_params_env_knobs(self, monkeypatch):
        from semiuhpe_tpu.ops.pallas_window_attention import _compiler_params
        assert _compiler_params(2) is None
        monkeypatch.setenv("SEMIUHPE_ATTN_PAR", "1")
        cp = _compiler_params(2)
        assert cp.dimension_semantics == ("parallel", "arbitrary")
        monkeypatch.setenv("SEMIUHPE_ATTN_VMEM_LIMIT_MB", "15")
        cp = _compiler_params(3)
        assert cp.dimension_semantics == ("parallel", "parallel",
                                          "arbitrary")
        assert cp.vmem_limit_bytes == 15 * 2 ** 20

    @pytest.mark.parametrize("h,b,n,d", [
        (2, 8, 49, 32),
        (2, 32, 196, 32),
    ])
    def test_gradients_match_einsum(self, h, b, n, d):
        q, k, v, bias = _make(h, b, n, d, jnp.float32)
        scale = d ** -0.5
        w = jnp.asarray(
            np.random.default_rng(1).normal(size=(h, b, d, n)), jnp.float32)

        def loss_ref(q, k, v, bias):
            return jnp.sum(einsum_reference(q, k, v, bias, scale) * w)

        def loss_ker(q, k, v, bias):
            return jnp.sum(window_attention(q, k, v, bias, scale, True) * w)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g_ker = jax.grad(loss_ker, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for a, b_ in zip(g_ker, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=3e-4, atol=3e-4)

    def test_bfloat16_forward_close(self):
        q, k, v, bias = _make(2, 8, 49, 32, jnp.bfloat16)
        scale = 32 ** -0.5
        ref = einsum_reference(q, k, v, bias, scale).astype(jnp.float32)
        got = window_attention(q, k, v, bias, scale, True).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2)


class TestShardedWindowAttention:
    def test_shard_map_matches_global_einsum(self):
        """window_attention_sharded on the 8-dev mesh == global einsum.

        Exercises the multi-device lowering path (a bare pallas_call is
        an opaque custom call the SPMD partitioner would gather) and the
        replicated-bias cotangent psum inserted by shard_map's transpose.
        """
        from semiuhpe_tpu.ops.pallas_window_attention import \
            window_attention_sharded
        from semiuhpe_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                                trace_mesh)

        mesh = make_mesh()
        h, b, n, d = 2, 16, 49, 32  # b=16 -> 2 windows per device
        q, k, v, bias = _make(h, b, n, d, jnp.float32)
        scale = d ** -0.5
        w = jnp.asarray(
            np.random.default_rng(1).normal(size=(h, b, d, n)), jnp.float32)

        def loss_ref(q, k, v, bias):
            return jnp.sum(einsum_reference(q, k, v, bias, scale) * w)

        def loss_sharded(q, k, v, bias):
            out = window_attention_sharded(q, k, v, bias, scale, mesh,
                                           interpret=True)
            return jnp.sum(out * w)

        ref_l, ref_g = jax.value_and_grad(
            loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        got_l, got_g = jax.jit(jax.value_and_grad(
            loss_sharded, argnums=(0, 1, 2, 3)))(q, k, v, bias)
        np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-4)
        for a, b_ in zip(got_g, ref_g):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=3e-4, atol=3e-4)

    def test_trace_mesh_routes_module_through_shard_map(self):
        """A WindowAttention module traced under jit_step on the 8-dev
        mesh (interpret mode) matches the einsum path, with the input
        batch actually sharded."""
        from semiuhpe_tpu.models import tinyvit
        from semiuhpe_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                                trace_mesh)
        import os

        mesh = make_mesh()
        x = jnp.asarray(
            np.random.default_rng(3).normal(size=(16, 49, 64)), jnp.float32)
        mod = tinyvit.WindowAttention(64, 32, 2, (7, 7), dtype=jnp.float32)
        params = mod.init(jax.random.key(0), x)

        old = os.environ.get("SEMIUHPE_PALLAS_ATTN")
        try:
            os.environ["SEMIUHPE_PALLAS_ATTN"] = "0"
            y_ref = mod.apply(params, x)

            os.environ["SEMIUHPE_PALLAS_ATTN"] = "interpret"

            def fwd(p, xb):
                with trace_mesh(mesh, "data"):
                    return mod.apply(p, xb)

            xs = jax.device_put(x, batch_sharding(mesh))
            y = jax.jit(fwd)(params, xs)
        finally:
            if old is None:
                os.environ.pop("SEMIUHPE_PALLAS_ATTN", None)
            else:
                os.environ["SEMIUHPE_PALLAS_ATTN"] = old
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-5)


class TestTinyViTPallasToggle:
    def test_tinyvit_block_toggle_equivalence(self, monkeypatch):
        """WindowAttention module output identical under both paths."""
        from semiuhpe_tpu.models import tinyvit

        x = jnp.asarray(
            np.random.default_rng(3).normal(size=(4, 49, 64)), jnp.float32)
        mod = tinyvit.WindowAttention(64, 32, 2, (7, 7), dtype=jnp.float32)
        params = mod.init(jax.random.key(0), x)

        monkeypatch.setenv("SEMIUHPE_PALLAS_ATTN", "0")
        y_einsum = mod.apply(params, x)
        monkeypatch.setenv("SEMIUHPE_PALLAS_ATTN", "interpret")
        y_pallas = mod.apply(params, x)
        np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_einsum),
                                   rtol=2e-5, atol=2e-5)
