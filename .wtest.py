import sys, time, numpy as np, jax, jax.numpy as jnp
def log(*a):
    print(*a); sys.stdout.flush()
from molchanica_tpu.md.config import Integrator, MdConfig
from molchanica_tpu.md.engine import MdSim
from molchanica_tpu.molecules.spec import assemble_system
from molchanica_tpu.systems.water import OPC
box = np.array([28.05]*3)
asys = assemble_system([], box_extent=box, water_model=OPC, seed=2)
sim = MdSim(asys.topology, MdConfig(integrator=Integrator.langevin_middle(gamma=2.0),
    temp_target=310.0, lj_cutoff=9.0, coulomb_cutoff=9.0, dtype="float32",
    max_init_relaxation_iters=150, steps_per_chunk=100, seed=7),
    asys.positions, box_extent=box, method="cells_pme")
log("E after relax: %.2f" % sim.potential_energy())
t0=time.time(); sim.step(0.002, 100)
log("+100x2fs: T=%.1f E=%.1f (%.2f ms/step)" % (sim.temperature(), float(sim.state.pe_last), (time.time()-t0)*10))
t0=time.time(); sim.step(0.002, 100)
log("steady: %.2f ms/step" % ((time.time()-t0)*10))
