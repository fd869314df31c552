"""Standalone runner for the compiled-Pallas-under-shard_map parity check
(VERDICT r4 #1c). Run ON THE TPU HOST (axon backend):

    python tools/check_sharded_kernel.py

Prints one JSON line; `sharded_kernel_parity: true` is the pass signal.
The same check runs inside `python bench.py` as the `sharded_parity`
section.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

if __name__ == "__main__":
    import bench
    import optrace_tpu as ot
    with ot.global_options.no_warnings(), ot.global_options.no_progress_bar():
        print(json.dumps(bench.check_sharded_kernel()))
