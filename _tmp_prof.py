import os, time, sys
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
from fenet.utils.compilation_cache import enable
enable(platform="cpu")
T0 = time.time()
def mark(s): print(f"[{time.time()-T0:7.1f}s] {s}", flush=True)

import tempfile
from fenet.data.synthetic import write_synthetic_shapenet
from fenet.train.config import TrainConfig
from fenet.train.driver import train_net
root = tempfile.mkdtemp()
write_synthetic_shapenet(root, cats=("02691156",), models_per_cat=1)
mark("synthetic data written")
cfg = TrainConfig(batch_size=8, nepoch=1, validate_epochs=(1,), lr=1e-3,
    emd_iters=5, eval_icp_iterations=8, eval_emd_iters=5, backbone="RepVGG-TEST",
    data_parallel=2, manual_seed=3,
    dir_path=os.path.join(root, "output") + "/",
    splits_path=os.path.join(root, "splits"),
    data_dir_imgs=os.path.join(root, "ShapeNetRendering") + "/",
    data_dir_pcl=os.path.join(root, "ShapeNet_pointclouds") + "/")

# instrument train_net's internals by monkeypatching key calls
import fenet.train.trainer as tr
orig_init = tr.Trainer.init_state
def timed_init(self, *a, **k):
    t = time.time(); r = orig_init(self, *a, **k); mark(f"init_state {time.time()-t:.1f}s"); return r
tr.Trainer.init_state = timed_init
orig_fit = tr.Trainer.fit_epoch
def timed_fit(self, *a, **k):
    t = time.time(); r = orig_fit(self, *a, **k); mark(f"fit_epoch {time.time()-t:.1f}s"); return r
tr.Trainer.fit_epoch = timed_fit
import fenet.eval.runner as er
orig_ed = er.evaluate_dataset
def timed_ed(*a, **k):
    t = time.time(); r = orig_ed(*a, **k); mark(f"evaluate_dataset {time.time()-t:.1f}s"); return r
er.evaluate_dataset = timed_ed
import fenet.train.driver as dr
dr.evaluate_dataset = timed_ed
import fenet.train.checkpoint as ck
orig_sc = ck.save_checkpoint
def timed_sc(*a, **k):
    t = time.time(); r = orig_sc(*a, **k); mark(f"save_checkpoint {time.time()-t:.1f}s"); return r
dr.save_checkpoint = timed_sc

t = time.time()
res = train_net("02691156", cfg)
mark(f"train_net total {time.time()-t:.1f}s")

# resume leg
cfg2 = TrainConfig(**{**cfg.__dict__, "resume": True, "nepoch": 2, "validate_epochs": ()})
t = time.time()
res2 = train_net("02691156", cfg2)
mark(f"resume train_net total {time.time()-t:.1f}s")
