"""airfoil_tpu — a TPU-native airfoil CFD framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of AeroLab
(reference: 583phoenix-hue/Airfoil-CFD-Tool). Where the reference shells out to
the XFOIL Fortran binary per analysis point (reference main.py:284-519) and
runs a D2Q9 lattice-Boltzmann wind tunnel in browser WebGL2 fragment shaders
(reference pages/airfoil_flow_lbm_aerolab.html), this framework runs the
entire compute path on TPU:

- ``geometry``  — .dat coordinate parsing + repair (Selig/Lednicer detection,
  winding correction, LE dedup, closed-TE preservation, range filtering).
- ``paneling``  — differentiable cosine arc-length re-paneling + smoothing.
- ``inviscid``  — linear-strength vortex panel method (batched influence
  matrix build + dense solve on the MXU), Cp/CL/Cm.
- ``viscous``   — integral boundary-layer march with e^N transition and
  viscous-inviscid coupling (the XFOIL-equivalent physics).
- ``polar``     — vmapped (alpha, Re) sweeps with the three-strategy
  (viscous -> smoothed -> inviscid) fallback as a batched decision.
- ``lbm``       — D2Q9 collide-stream Pallas kernel (VMEM-resident lattice),
  forces, separation fraction, render fields.
- ``parallel``  — jax.sharding meshes: data-parallel polar batching and
  spatially-decomposed LBM with halo exchange.
- ``api``       — FastAPI service with the reference's JSON contract.
- ``ui``        — Streamlit frontend.
"""

__version__ = "0.1.0"
