import sys, time
import jax.numpy as jnp
t0 = time.perf_counter()
_ = float(jnp.sum(jnp.ones(8)))
print(f"[stall {time.perf_counter()-t0:.0f}s]", flush=True)
sys.argv = ["make_snr_curve.py"]
src = open("/root/repo/examples/make_snr_curve.py").read()
src = src.replace('if __name__ == "__main__":\n    main()', '')
exec(src)
main()
