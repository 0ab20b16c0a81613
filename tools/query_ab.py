"""Fixed-input per-query A/B probe (the adjudication harness behind
docs/ROUND5.md §1, generalizing tools/kernel_ab.py to driver queries):
times the named `queries()` entries best-of-2 on sf0.1 local[32] and
prints one JSON line. Run once per side per round, interleaved, each
side from its own checkout:

  for i in 1 2 3; do
    python tools/query_ab.py /path/to/HEAD  q1,q2
    python tools/query_ab.py /path/to/other q1,q2
  done

The repo argument decides which code is measured (sys.path + cwd);
identical input and alternating execution cancel host-window drift.
"""
import json
import os
import sys
import time

repo = sys.argv[1]
names = sys.argv[2].split(",")
sys.path.insert(0, repo)
os.chdir(repo)
import __spark_entry__ as entrymod  # noqa: E402

from pdf_parser_spark.engine.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("query_ab", cpus=int(os.environ.get(
    "SPARK_GRAFT_CPUS", "32")))
spark.sparkContext.setLogLevel("ERROR")
qs = entrymod.queries()
t = {}
for _ in range(2):  # best-of-2: second pass reports warm-plan cost
    for n in names:
        t0 = time.time()
        qs[n](spark, sf_dir).count()
        w = round(time.time() - t0, 3)
        if n not in t or w < t[n]:
            t[n] = w
print(json.dumps({"repo": repo, "t": t}))
spark.stop()
