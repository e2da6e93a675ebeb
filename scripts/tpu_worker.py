"""Persistent TPU job worker: keeps the chip lease, executes queued jobs.

The tunneled TPU charges every fresh process a multi-minute lease
reacquisition (see .claude/skills/verify).  This worker holds the lease
once and executes python job files from a queue directory in a SHARED
namespace (so later jobs can reuse objects built by earlier ones —
trainers, compiled functions, results).

Protocol:
  queue dir: /tmp/tpuq
  submit   : write  /tmp/tpuq/<name>.py   (atomic rename recommended)
  running  : worker creates <name>.running
  done     : worker writes <name>.out (stdout+stderr+traceback) and
             <name>.ok or <name>.err, removes <name>.running
  stop     : touch /tmp/tpuq/STOP

Usage: python -u scripts/tpu_worker.py [queue_dir]
"""
import io
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    qdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpuq"
    os.makedirs(qdir, exist_ok=True)
    import jax  # acquire the lease up front
    print("devices:", jax.devices(), flush=True)
    ns = {"__name__": "__tpu_worker__"}
    done = set()
    while True:
        if os.path.exists(os.path.join(qdir, "STOP")):
            print("STOP seen, exiting", flush=True)
            return
        jobs = sorted(f for f in os.listdir(qdir)
                      if f.endswith(".py") and f not in done)
        if not jobs:
            time.sleep(0.5)
            continue
        for job in jobs:
            path = os.path.join(qdir, job)
            base = path[:-3]
            done.add(job)
            open(base + ".running", "w").close()
            print(f"=== running {job}", flush=True)
            buf = io.StringIO()
            ok = True
            t0 = time.time()
            old_out, old_err = sys.stdout, sys.stderr
            try:
                sys.stdout = sys.stderr = buf
                with open(path) as f:
                    code = compile(f.read(), path, "exec")
                exec(code, ns)
            except BaseException:
                ok = False
                traceback.print_exc(file=buf)
            finally:
                sys.stdout, sys.stderr = old_out, old_err
            with open(base + ".out", "w") as f:
                f.write(buf.getvalue())
            open(base + (".ok" if ok else ".err"), "w").close()
            os.remove(base + ".running")
            print(f"=== {job} {'OK' if ok else 'ERR'} "
                  f"({time.time()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
