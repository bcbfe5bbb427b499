import sys, time, numpy as np, jax, jax.numpy as jnp
def log(*a):
    print(*a); sys.stdout.flush()
from molchanica_tpu.md.config import HydrogenConstraint, Integrator, MdConfig
from molchanica_tpu.md.engine import MdSim
from molchanica_tpu.systems.bench_systems import build_solvated_protein
from molchanica_tpu.ops.cells import plan_cells
asys = build_solvated_protein(n_residues=60, target_sites=6000, seed=3)
top = asys.topology; box = asys.box_extent
cfg = MdConfig(integrator=Integrator.langevin_middle(gamma=1.0), temp_target=310.0,
    lj_cutoff=9.0, coulomb_cutoff=9.0, hydrogen_constraint=HydrogenConstraint.shake(),
    dtype="float32", max_init_relaxation_iters=300, steps_per_chunk=100, seed=7)
nc, cap, sh = plan_cells(box, 9.0, top.n_atoms_real, cfg.cell_capacity_factor, x0=asys.positions)
log("pre-relax plan: nc=%s cap=%d shifts=%d -> pairs/step=%.1fM" % (nc, cap, len(sh), len(sh)*np.prod(nc)*cap*cap/1e6))
sim = MdSim(top, cfg, asys.positions, box_extent=box, method="cells_pme")
x1 = np.asarray(sim.state.positions)
nc, cap, sh = plan_cells(box, 9.0, top.n_atoms_real, cfg.cell_capacity_factor, x0=x1)
log("post-relax plan: nc=%s cap=%d -> pairs/step=%.1fM" % (nc, cap, len(sh)*np.prod(nc)*cap*cap/1e6))
# time the direct fn alone vs full force
from molchanica_tpu.ops.cells import make_xla_direct_force_fn
from molchanica_tpu.ops.pme import ewald_beta_for
d = make_xla_direct_force_fn(top, cfg, box, x0=x1)
beta = ewald_beta_for(9.0, cfg.ewald_rtol)
b = sim.state.box; c = sim.state.couple
x = sim.state.positions
dj = jax.jit(lambda x: d(x, b, c, beta))
F, elj, ec = dj(x); jax.block_until_ready(F)
t0=time.time()
for i in range(20):
    F, elj, ec = dj(x + i * 1e-6)
jax.block_until_ready(F)
log("direct-only: %.2f ms" % ((time.time()-t0)/20*1000))
fj = jax.jit(sim.force_fn)
F2, _ = fj(x, b, c); jax.block_until_ready(F2)
t0=time.time()
for i in range(20):
    F2, _ = fj(x + i * 1e-6, b, c)
jax.block_until_ready(F2)
log("full force: %.2f ms" % ((time.time()-t0)/20*1000))
