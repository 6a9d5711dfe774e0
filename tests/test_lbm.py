"""LBM tests: conservation, fixed points, boundary semantics, diagnostics,
Pallas/XLA agreement (CPU interpret), and sharded-vs-single-device parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airfoil_tpu.config import LBMConfig
from airfoil_tpu.models import naca4
from airfoil_tpu.lbm.core import (
    D2Q9_E, D2Q9_W, D2Q9_OPP,
    equilibrium_init, lbm_step, macro_fields, step_body,
)
from airfoil_tpu.lbm.masks import rasterize_airfoil
from airfoil_tpu.lbm.diagnostics import forces_and_separation, render_fields
from airfoil_tpu.lbm.runner import WindTunnel
from airfoil_tpu.lbm.sharded import sharded_lbm_steps


SMALL = LBMConfig(nx=96, ny=48)


def small_setup(alpha=6.0):
    mask = jnp.asarray(rasterize_airfoil(naca4(2, 4, 12, 40), alpha, SMALL))
    f = equilibrium_init(SMALL.ny, SMALL.nx, SMALL.u0)
    return f, mask


class TestLattice:
    def test_weights_sum_to_one(self):
        assert abs(float(np.sum(D2Q9_W)) - 1.0) < 1e-7

    def test_opposites(self):
        for i in range(9):
            assert (D2Q9_E[i] == -D2Q9_E[D2Q9_OPP[i]]).all()

    def test_equilibrium_macro_roundtrip(self):
        f = equilibrium_init(8, 128, 0.06)
        rho, ux, uy = macro_fields(f)
        np.testing.assert_allclose(np.asarray(rho), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ux), 0.06, atol=1e-6)
        np.testing.assert_allclose(np.asarray(uy), 0.0, atol=1e-6)


class TestStep:
    def test_uniform_flow_is_fixed_point(self):
        f0 = equilibrium_init(SMALL.ny, SMALL.nx, SMALL.u0)
        solid = jnp.zeros((SMALL.ny, SMALL.nx))
        f1 = lbm_step(f0, solid, SMALL.u0, SMALL.tau, steps=10)
        assert float(jnp.abs(f1 - f0).max()) < 1e-5

    def test_stability_with_airfoil(self):
        f, mask = small_setup()
        f = lbm_step(f, mask, SMALL.u0, SMALL.tau, steps=800)
        assert bool(jnp.all(jnp.isfinite(f)))
        rho, ux, uy = macro_fields(f)
        fluid = np.asarray(mask) < 0.5
        assert 0.9 < float(jnp.min(jnp.where(mask < 0.5, rho, 1.0))) < 1.1

    def test_wake_deficit_forms(self):
        f, mask = small_setup()
        f = lbm_step(f, mask, SMALL.u0, SMALL.tau, steps=800)
        _rho, ux, _uy = macro_fields(f)
        ux = np.asarray(ux)
        m = np.asarray(mask)
        # Behind the airfoil (downstream of solid columns), streamwise
        # velocity dips below freestream.
        solid_cols = np.where(m.any(axis=0))[0]
        wake_col = min(solid_cols.max() + 5, SMALL.nx - 2)
        mid = SMALL.ny // 2
        assert ux[mid, wake_col] < SMALL.u0 * 0.98

    def test_high_alpha_stays_finite(self):
        # The stability clamps (html:344-351) must hold a broadside-ish case.
        mask = jnp.asarray(rasterize_airfoil(naca4(2, 4, 12, 40), 25.0, SMALL))
        f = equilibrium_init(SMALL.ny, SMALL.nx, 0.1)
        f = lbm_step(f, mask, 0.1, SMALL.tau, steps=600)
        assert bool(jnp.all(jnp.isfinite(f)))


class TestMask:
    def test_mask_covers_airfoil_extent(self):
        mask = rasterize_airfoil(naca4(0, 0, 12, 40), 0.0, SMALL)
        assert mask.sum() > 10
        cols = np.where(mask.any(axis=0))[0]
        x0 = SMALL.dx0 + cols.min() / SMALL.nx * (SMALL.dx1 - SMALL.dx0)
        x1 = SMALL.dx0 + cols.max() / SMALL.nx * (SMALL.dx1 - SMALL.dx0)
        assert -0.1 < x0 < 0.15 and 0.85 < x1 < 1.1

    def test_rotation_changes_mask(self):
        m0 = rasterize_airfoil(naca4(2, 4, 12, 40), 0.0, SMALL)
        m15 = rasterize_airfoil(naca4(2, 4, 12, 40), 15.0, SMALL)
        assert (m0 != m15).any()


class TestDiagnostics:
    def test_lift_sign_and_alpha_trend(self):
        cls = []
        for alpha in (0.0, 10.0):
            f, mask = small_setup(alpha)
            f = lbm_step(f, mask, SMALL.u0, SMALL.tau, steps=1200)
            cl, cd, sep = forces_and_separation(
                f, mask, SMALL.u0, SMALL.chord_cells)
            cls.append(float(cl))
            assert float(cd) > 0.0
        assert cls[1] > cls[0], "CL must grow with alpha"

    def test_separation_at_high_alpha(self):
        f, mask = small_setup(22.0)
        f = lbm_step(f, mask, SMALL.u0, SMALL.tau, steps=1500)
        _cl, _cd, sep = forces_and_separation(
            f, mask, SMALL.u0, SMALL.chord_cells)
        assert float(sep) > 0.05, "high alpha should show reversed flow"

    def test_render_fields_shapes_and_nan_mask(self):
        f, mask = small_setup()
        f = lbm_step(f, mask, SMALL.u0, SMALL.tau, steps=50)
        speed, cp, vort, ux, uy = render_fields(f, mask, SMALL.u0)
        assert speed.shape == (SMALL.ny, SMALL.nx)
        solid = np.asarray(mask) > 0.5
        assert np.all(np.isnan(np.asarray(speed)[solid]))
        assert np.all(np.isfinite(np.asarray(speed)[~solid]))


class TestWindTunnel:
    def test_frames_and_alpha_change(self):
        wt = WindTunnel(naca4(2, 4, 12, 40), cfg=SMALL, use_pallas=False)
        out = None
        for _ in range(30):
            out = wt.frame()
        assert np.isfinite(out["cl"]) and out["cd"] >= 0.0
        assert out["step"] == 30 * SMALL.steps_per_frame
        wt.set_alpha(12.0)
        out2 = wt.frame()
        assert out2["alpha"] == 12.0
        assert out2["fields"]["speed"].shape == (SMALL.ny, SMALL.nx)


class TestPallasParity:
    def test_interpret_matches_xla(self):
        """Pallas kernel (interpreter mode on CPU) == XLA path, bitwise-ish."""
        from functools import partial
        import jax.experimental.pallas as pl
        from airfoil_tpu.lbm import kernel as K

        cfg = LBMConfig(nx=128, ny=32)
        mask = jnp.asarray(rasterize_airfoil(naca4(2, 4, 12, 40), 6.0, cfg))
        f0 = equilibrium_init(cfg.ny, cfg.nx, cfg.u0)
        fx = lbm_step(f0, mask, cfg.u0, cfg.tau, steps=8)

        import jax.experimental.pallas.tpu as pltpu
        scal = jnp.stack([jnp.float32(cfg.u0), jnp.float32(cfg.tau)])
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        fp = pl.pallas_call(
            partial(K._kernel, steps=8),
            out_shape=jax.ShapeDtypeStruct(f0.shape, f0.dtype),
            grid_spec=grid_spec,
            interpret=True,
        )(scal, f0, mask)
        np.testing.assert_allclose(np.asarray(fp), np.asarray(fx),
                                   rtol=1e-5, atol=1e-6)


class TestSharded:
    def test_sharded_matches_single_device(self):
        from airfoil_tpu.parallel import batch_mesh

        mesh = batch_mesh(jax.devices()[:4])
        cfg = LBMConfig(nx=96, ny=48)
        mask = jnp.asarray(rasterize_airfoil(naca4(2, 4, 12, 40), 6.0, cfg))
        f0 = equilibrium_init(cfg.ny, cfg.nx, cfg.u0)
        ref = lbm_step(f0, mask, cfg.u0, cfg.tau, steps=12)
        out = sharded_lbm_steps(mesh, f0, mask, cfg.u0, cfg.tau, steps=12)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

    def test_amortised_halo_multi_round(self):
        """K-step halo exchange: multi-round plus remainder plans must
        match the single-device evolution (staleness stays in the crop)."""
        from airfoil_tpu.parallel import batch_mesh

        mesh = batch_mesh(jax.devices()[:4])
        cfg = LBMConfig(nx=96, ny=48)
        mask = jnp.asarray(rasterize_airfoil(naca4(2, 4, 12, 40), 6.0, cfg))
        f0 = equilibrium_init(cfg.ny, cfg.nx, cfg.u0)
        ref = lbm_step(f0, mask, cfg.u0, cfg.tau, steps=13)
        out = sharded_lbm_steps(mesh, f0, mask, cfg.u0, cfg.tau, steps=13,
                                halo_steps=5)   # rounds of 5,5,3
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)


class TestPathSelection:
    def test_big_grids_avoid_vmem_kernel(self):
        """Lattices beyond VMEM residency must auto-select the XLA path."""
        from airfoil_tpu.lbm.bench import bench_mlups  # noqa: F401
        from airfoil_tpu.config import LBMConfig
        from airfoil_tpu.lbm.runner import WindTunnel
        from airfoil_tpu.models import naca4

        # On CPU use_pallas resolves False regardless; exercise the
        # fits-vmem arithmetic directly.
        fits = lambda nx, ny: 2 * 9 * nx * ny * 4 <= 20_000_000
        assert fits(640, 384)
        assert not fits(1024, 512)
        r = WindTunnel(naca4(2, 4, 12, 40), cfg=LBMConfig(nx=128, ny=64))
        assert r.use_pallas is False  # CPU


class TestTiledKernel:
    def test_tiled_interpret_matches_xla(self):
        """Row-strip halo kernel (interpret mode) == XLA path over multiple
        strips, including the clamped edge windows."""
        from airfoil_tpu.lbm.kernel import lbm_steps_pallas_tiled

        cfg = LBMConfig(nx=128, ny=96)
        mask = jnp.asarray(rasterize_airfoil(naca4(2, 4, 12, 40), 6.0, cfg))
        f0 = equilibrium_init(cfg.ny, cfg.nx, cfg.u0)
        fx = lbm_step(f0, mask, cfg.u0, cfg.tau, steps=4)
        with jax.disable_jit():  # interpret path under disable_jit on CPU
            import jax.experimental.pallas.tpu as pltpu
            with pltpu.force_tpu_interpret_mode():
                ft = lbm_steps_pallas_tiled(f0, mask, cfg.u0, cfg.tau,
                                            steps=4, tile_rows=32)
        np.testing.assert_allclose(np.asarray(ft), np.asarray(fx),
                                   rtol=1e-6, atol=1e-7)

    def test_tiled_shape_validation(self):
        from airfoil_tpu.lbm.kernel import lbm_steps_pallas_tiled

        f0 = equilibrium_init(40, 128, 0.06)
        mask = jnp.zeros((40, 128), jnp.float32)
        with pytest.raises(ValueError):
            lbm_steps_pallas_tiled(f0, mask, 0.06, 0.58, tile_rows=32)

    def test_path_selection_tiled_for_large_grids(self):
        """Grid beyond VMEM residency but tile-aligned -> tiled kernel on
        TPU (asserted via the selection arithmetic; CPU runs XLA)."""
        from airfoil_tpu.lbm.runner import WindTunnel

        r = WindTunnel(naca4(2, 4, 12, 40), cfg=LBMConfig(nx=128, ny=64))
        assert r.use_pallas is False and r.tiled is False  # CPU
        fits = lambda nx, ny: 2 * 9 * nx * ny * 4 <= 20_000_000
        tileable = lambda nx, ny: (nx % 128 == 0 and ny % 8 == 0
                                   and ny % 32 == 0 and ny >= 48)
        # 2048x1024: beyond VMEM, tile-aligned -> tiled on TPU.
        assert not fits(2048, 1024) and tileable(2048, 1024)
        # default grid: VMEM-resident kernel territory.
        assert fits(384, 192)
