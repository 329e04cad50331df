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

cfg = tiny_model_config(256)
tcfg = TrainConfig(lr=1e-3)
_, state0 = create_train_state(cfg, tcfg, steps_per_epoch=1)
rng = np.random.default_rng(0)
mesh = make_mesh(n_data=8, n_model=1)
batch = shard_batch(mesh, {
    "pc1": rng.normal(size=(8, 256, 3)).astype(np.float32),
    "pc2": rng.normal(size=(8, 256, 3)).astype(np.float32),
    "gt": rng.normal(size=(8, 3, 256, 3)).astype(np.float32),
})
state = jax.device_put(state0, replicated(mesh))
txt = train_step.lower(state, batch, jax.random.PRNGKey(0), cfg, tcfg).compile().as_text()
for line in txt.splitlines():
    if "all-gather" in line and ("[24,128,4096]" in line or "[24,64,4096]" in line):
        print(line.strip()[:700])
        print("---")
