"""Stress harness for the parallel-OPTIMIZE concurrency path.

Reproduces the round-6 flake (Py4JJavaError out of the ThreadPoolExecutor
bin runner in a long-lived loaded session) by looping the two contended
scenarios — parallel bins alone, and a live append racing a parallel
optimize — many times inside ONE session, with the session pre-loaded the
way a full pytest run loads it (caches, many prior jobs). Prints the FULL
Java stack on the first failure so the root cause is visible.

Usage: python scripts/stress_parallel_optimize.py [iterations]
"""

import os
import shutil
import sys
import threading
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("A5_TEST_SF_DIR", "/root/testdata/sf0.001")


def main(iterations: int = 20) -> int:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from pyspark.sql import functions as F

    from a5spark.entry_queries import _spark_cell9
    from a5spark.operators import layout
    from a5spark.session import get_spark

    spark = get_spark("a5spark-stress-parallel-optimize")
    spark.sparkContext.setLogLevel("ERROR")

    # pre-load the session the way a full suite does: a few hundred jobs,
    # some cached data, wide shuffles
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    df_all = _spark_cell9(li).select("cell", "l_quantity")
    df_all.cache().count()
    for _ in range(3):
        df_all.groupBy("cell").count().orderBy(F.desc("count")).limit(5).collect()

    failures = 0
    for it in range(iterations):
        d = f"/tmp/a5spark_stress/popt_{it}"
        shutil.rmtree(d, ignore_errors=True)
        try:
            base = df_all.filter(F.col("l_quantity") <= 30)
            extra = df_all.filter(F.col("l_quantity") > 30)
            layout.write_cell_layout(base, d, cell="cell", n_files=12)
            man0 = layout.read_manifest(spark, d)
            sizes = [e["bytes"] for e in man0["files"]]
            errs = []

            def do_append():
                try:
                    layout.append_cell_layout(extra, d, batch_id=99, n_files=2)
                except Exception as e:  # noqa: BLE001
                    errs.append(e)

            t = threading.Thread(target=do_append)
            t.start()
            stats = layout.optimize_cell_layout(
                spark, d,
                target_file_bytes=sum(sizes) // 3,
                min_file_bytes=max(sizes) + 1,
                parallel_bins=4,
                retain_old=True,
            )
            t.join(120)
            assert not t.is_alive(), "append thread hung"
            if errs:
                raise errs[0]
            man = layout.read_manifest(spark, d)
            assert 99 in man.get("batches", [])
            assert sum(e["rows"] for e in man["files"]) == df_all.count()
            assert man["version"] == man0["version"] + stats["bins"] + 1
            print(f"iter {it}: ok (bins={stats['bins']})", flush=True)
        except Exception:
            failures += 1
            print(f"iter {it}: FAILED", flush=True)
            traceback.print_exc()
            # full Java stack for Py4J errors
            e = sys.exc_info()[1]
            js = getattr(e, "java_exception", None)
            if js is not None:
                print("---- java stack ----", flush=True)
                print(js.toString(), flush=True)
            break
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print(f"done: {failures} failures / {iterations} iterations", flush=True)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 20))
