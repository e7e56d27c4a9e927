import faulthandler, threading, sys
faulthandler.dump_traceback_later(240, repeat=True, file=sys.stderr)
import jax
jax.config.update("jax_log_compiles", True)
import bench
bench.main()
