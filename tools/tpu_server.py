"""Persistent TPU experiment server: execs /tmp/tpu_cmd_<i>.py in-process.

Keeps the TPU attach + warmed engines alive across experiments (attach costs
1-8 min per process on this rig).  Each command file runs in a shared
namespace; stdout/stderr + status land in /tmp/tpu_out_<i>.log.
"""

import contextlib
import io
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ns: dict = {}
print("server ready", flush=True)
i = 0
while True:
    path = f"/tmp/tpu_cmd_{i}.py"
    stop = "/tmp/tpu_stop"
    if os.path.exists(stop):
        print("server stopping", flush=True)
        break
    if os.path.exists(path):
        src = open(path).read()
        out_path = f"/tmp/tpu_out_{i}.log"
        buf = io.StringIO()
        t0 = time.time()
        try:
            with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
                exec(compile(src, path, "exec"), ns)
            status = "OK"
        except BaseException:
            buf.write(traceback.format_exc())
            status = "ERR"
        with open(out_path, "w") as f:
            f.write(buf.getvalue() + f"\n== {status} ({time.time() - t0:.1f}s)\n")
        print(f"cmd {i}: {status}", flush=True)
        i += 1
    else:
        time.sleep(0.5)
