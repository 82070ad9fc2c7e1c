"""agg_hash (TPC-H Q1) decomposition probe at a given sf dir.

Usage: python tools/q1_probe.py <sf_dir> <variant> [variant ...]
Variants share the bench protocol: tuned splits, cached lineitem,
warm + median-of-3, noop sink. Prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

SF = sys.argv[1]
VARIANTS = sys.argv[2:]
CUTOFF = "2001-09-02 00:00:00"


def cents_round(col):
    return F.round(F.col(col) * 100).cast("long")


def cents_fast(col):
    # the shipped form (functions/exact.py cents): floor(x*100 + 0.5)
    return F.floor(F.col(col) * 100 + F.lit(0.5))


def filtered(li):
    return li.filter(F.col("l_shipdate") <= F.lit(CUTOFF).cast("timestamp_ntz"))


def build(li, variant):
    from pycaim_spark.functions.exact import favg, fsum, fsum_split

    if variant == "scan":
        return filtered(li).select(
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax",
        )
    if variant == "skeleton":
        return (
            filtered(li).groupBy("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("count_order"))
        )
    if variant == "skeleton7":
        # 7 plain long sums of untransformed casts: aggregate-buffer cost
        # with trivial input expressions
        c = [F.col(x).cast("long") for x in
             ("l_quantity", "l_extendedprice", "l_discount", "l_tax")]
        return (
            filtered(li).groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(c[0]), F.sum(c[1]), F.sum(c[2]), F.sum(c[3]),
                 F.sum(c[0] + c[1]), F.sum(c[2] + c[3]),
                 F.count(F.lit(1)))
        )
    if variant in ("full", "fastcents"):
        cc = cents_round if variant == "full" else cents_fast
        q_c, ep_c, d_c, t_c = (cc(x) for x in
                               ("l_quantity", "l_extendedprice",
                                "l_discount", "l_tax"))
        disc_price = ep_c * (F.lit(100).cast("long") - d_c)
        charge = disc_price * (F.lit(100).cast("long") + t_c)
        return (
            filtered(li).groupBy("l_returnflag", "l_linestatus")
            .agg(
                fsum(q_c, 2, "sum_qty"),
                fsum(ep_c, 2, "sum_base_price"),
                fsum(disc_price, 4, "sum_disc_price"),
                fsum_split(charge, 6, "sum_charge"),
                favg(q_c, 2, "avg_qty"),
                favg(ep_c, 2, "avg_price"),
                favg(d_c, 2, "avg_disc"),
                F.count(F.lit(1)).alias("count_order"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )
    if variant == "fullnosplit":
        # charge through plain fsum (UNSAFE at 100TB, probe only): isolates
        # the hi/lo split's cost
        from pycaim_spark.functions.exact import fsum as fs
        q_c, ep_c, d_c, t_c = (cents_round(x) for x in
                               ("l_quantity", "l_extendedprice",
                                "l_discount", "l_tax"))
        disc_price = ep_c * (F.lit(100).cast("long") - d_c)
        charge = disc_price * (F.lit(100).cast("long") + t_c)
        return (
            filtered(li).groupBy("l_returnflag", "l_linestatus")
            .agg(
                fs(q_c, 2, "sum_qty"),
                fs(ep_c, 2, "sum_base_price"),
                fs(disc_price, 4, "sum_disc_price"),
                fs(charge, 6, "sum_charge"),
                favg(q_c, 2, "avg_qty"),
                favg(ep_c, 2, "avg_price"),
                favg(d_c, 2, "avg_disc"),
                F.count(F.lit(1)).alias("count_order"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )
    raise SystemExit(f"unknown variant {variant}")


def main():
    from pycaim_spark.catalog import load_table
    from pycaim_spark.session import get_spark

    spark = get_spark(app_name="q1probe")
    total = sum(os.path.getsize(os.path.join(SF, f))
                for f in os.listdir(SF) if f.endswith(".parquet"))
    spark.conf.set("spark.sql.files.maxPartitionBytes",
                   str(max(4 << 20, min(128 << 20, total // 8))))
    li = load_table(spark, SF, "lineitem").cache()
    li.count()
    out = {}
    for v in VARIANTS:
        def run():
            t0 = time.perf_counter()
            build(li, v).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0
        run()  # warm
        out[v] = round(sorted(run() for _ in range(3))[1], 4)
    print(json.dumps({"sf": SF, "probe": out}))
    spark.stop()


if __name__ == "__main__":
    main()
