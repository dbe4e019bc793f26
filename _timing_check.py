import time, numpy as np, jax
import bench
m, ds = bench.build_model()
chunk = m._chunk(100)
state, data = m.state, m.train_data
state, metrics = chunk(state, data)
np.asarray(metrics["PSNR"])
t0 = time.perf_counter()
for _ in range(5):
    state, metrics = chunk(state, data)
np.asarray(metrics["PSNR"])
dt = time.perf_counter() - t0
print(f"RESULT: 500 steps in {dt:.2f}s -> {500/dt:.1f} steps/s")
