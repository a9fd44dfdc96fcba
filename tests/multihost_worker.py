"""Worker for the 2-process sharded-assembly test (test_sharding.py).

Runs one jax.distributed process of a 2-process x 4-device CPU mesh,
encodes a deterministic image with encode_image_sharded over the global
8-device "rows" axis, and writes the bytes to the given output path.
Byte identity across processes and vs the single-device encoder is
asserted by the parent test.

Usage: multihost_worker.py <process_id> <coordinator> <out_file>
"""

import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

pid, coordinator, out_file = int(sys.argv[1]), sys.argv[2], sys.argv[3]
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=2, process_id=pid)
assert len(jax.devices()) == 8, jax.devices()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))
from util import make_image  # noqa: E402

from himg_tpu.parallel import sharding  # noqa: E402

img = make_image(128, 64, 3, seed=77)
mesh = sharding.make_mesh(1, 8)
data = sharding.encode_image_sharded(mesh, img, quality=60, use_ycbcr=True)
Path(out_file).write_bytes(data)
print(f"[p{pid}] wrote {len(data)} bytes", flush=True)
jax.distributed.shutdown()
