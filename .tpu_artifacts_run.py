import sys, time
sys.argv = ["bench.py"]
import bench
import jax.numpy as jnp
import numpy as np

t0 = time.perf_counter()
_ = float(jnp.sum(jnp.ones(8)))
print(f"[stall {time.perf_counter()-t0:.0f}s]", flush=True)

rc = bench.verify()
print(f"[verify rc={rc}]", flush=True)

sps, ok = bench._streaming_throughput()
print(f"[streaming {sps:.0f} sps ok={ok}]", flush=True)

src = open("/root/repo/examples/make_snr_curve.py").read()
src = src.replace('if __name__ == "__main__":\n    main()', '')
exec(src)
main()
print("[snr curve done]", flush=True)
