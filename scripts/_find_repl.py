import os, sys, re
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import jax, numpy as np
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from mocopci_tpu.config import TrainConfig, tiny_model_config
from mocopci_tpu.parallel import make_mesh, replicated, shard_batch
from mocopci_tpu.training import create_train_state, train_step

npoints = 256
cfg = tiny_model_config(npoints)
tcfg = TrainConfig(lr=1e-3)
_, state0 = create_train_state(cfg, tcfg, steps_per_epoch=1)
rng = np.random.default_rng(0)
n_data = 8
B = n_data
mesh = make_mesh(n_data=n_data, n_model=1)
batch = shard_batch(mesh, {
    "pc1": rng.normal(size=(B, cfg.npoints, 3)).astype(np.float32),
    "pc2": rng.normal(size=(B, cfg.npoints, 3)).astype(np.float32),
    "gt": rng.normal(size=(B, 3, cfg.npoints, 3)).astype(np.float32),
})
state = jax.device_put(state0, replicated(mesh))
txt = train_step.lower(state, batch, jax.random.PRNGKey(0), cfg, tcfg).compile().as_text()
# top all-gathers by output size
dt = {"f32":4,"bf16":2,"s32":4,"u32":4,"pred":1}
rows = []
for line in txt.splitlines():
    if re.search(r"= \S*all-gather", line) or " all-gather(" in line:
        m = re.search(r"([a-z0-9]+)\[([\d,]*)\]", line.split("=",1)[1])
        if m:
            n = 1
            for d in filter(None, m.group(2).split(",")): n *= int(d)
            rows.append((n*dt.get(m.group(1),4), line.strip()[:220]))
rows.sort(reverse=True)
for sz, l in rows[:12]:
    print(f"{sz/1e6:8.2f}MB  {l}")
