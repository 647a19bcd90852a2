import time
import numpy as np
from fenet.utils.compilation_cache import enable
enable()
import bench
model, variables = bench._build_model_and_state()
from fenet.parallel.mesh import make_mesh
mesh = make_mesh(1)
for b in (512, 1024):
    t0 = time.time()
    ips = bench.run_inference_bench(model, variables, mesh, batch=b, reps=20)
    print(f"batch {b}: {ips:.0f} img/s (incl setup {time.time()-t0:.0f}s)", flush=True)
