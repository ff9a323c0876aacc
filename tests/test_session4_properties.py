"""Randomized planted tests for the session-4 kernels: each operator
is replayed against an INDEPENDENT brute-force implementation on
seeded random fixtures (the established window-kernel test pattern) —
the SQL oracles prove engine==DuckDB on the sf corpora; these prove
the semantics on adversarial shapes (ties, skew, singletons, empty
groups) the corpora may not contain."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(d, name, table):
    pq.write_table(table, str(d / f"{name}.parquet"))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_q21_matches_bruteforce(tmp_path, seed):
    from sotohp_ray.pipelines.relational import (
        Q21_LATE_DAYS,
        q21_suppliers_who_kept_waiting,
    )

    rng = np.random.RandomState(seed)
    d = tmp_path / "sf"
    d.mkdir()
    n_orders, n_supp = 60, 6
    base = np.datetime64("2020-01-01", "us")
    odate = base + np.random.RandomState(seed + 1).randint(
        0, 300, n_orders) * np.timedelta64(1, "D")
    status = rng.choice(["F", "O", "P"], n_orders)
    _write(d, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderstatus": pa.array(status),
    }))
    n_li = 220
    lo = rng.randint(0, n_orders, n_li)
    ls = rng.randint(0, n_supp, n_li)
    ship = odate[lo] + rng.randint(0, 150, n_li) * np.timedelta64(
        1, "D")
    _write(d, "lineitem", pa.table({
        "l_orderkey": pa.array(lo.astype(np.int64)),
        "l_suppkey": pa.array(ls.astype(np.int64)),
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
    }))
    _write(d, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"S{i}" for i in range(n_supp)]),
        "s_nationkey": pa.array(
            np.zeros(n_supp, np.int64)),
    }))
    _write(d, "nation", pa.table({
        "n_nationkey": pa.array([0], pa.int64()),
        "n_name": pa.array(["N0"]),
    }))
    # brute force
    want: dict[int, int] = {}
    for i in range(n_li):
        o = lo[i]
        if status[o] != "F":
            continue
        late_i = ship[i] > odate[o] + np.timedelta64(Q21_LATE_DAYS, "D")
        if not late_i:
            continue
        in_order = np.flatnonzero(lo == o)
        others = set(ls[in_order]) - {ls[i]}
        if not others:
            continue
        late_mask = ship[in_order] > odate[o] + np.timedelta64(
            Q21_LATE_DAYS, "D")
        late_supp = set(ls[in_order][late_mask])
        if late_supp == {ls[i]}:
            want[ls[i]] = want.get(ls[i], 0) + 1
    out = q21_suppliers_who_kept_waiting(str(d)).to_pandas()
    got = {int(s[1:]): int(n) for s, n in zip(out["s_name"],
                                              out["numwait"])}
    assert got == want


@pytest.mark.parametrize("seed", [3, 4])
def test_global_running_total_matches_pandas(tmp_path, seed):
    from sotohp_ray.pipelines.relational import (
        events_global_running_total,
    )

    rng = np.random.RandomState(seed)
    d = tmp_path / "sf"
    d.mkdir()
    n = 400
    base = np.datetime64("2024-01-01T00:00:00", "us")
    # ts spread over 5 days with duplicates (tie-break via event_id)
    ts = base + rng.randint(0, 5 * 86400, n) * np.timedelta64(1, "s")
    ts[rng.choice(n, 40, replace=False)] = base  # heavy tie cluster
    eid = rng.permutation(n).astype(np.int64)
    val = np.round(rng.normal(0, 10, n), 2)
    _write(d, "events", pa.table({
        "event_id": pa.array(eid),
        "ts": pa.array(ts, pa.timestamp("us")),
        "value": pa.array(val, pa.float64()),
    }))
    out = events_global_running_total(str(d)).to_pandas()
    order = np.lexsort((eid, ts))
    want = dict(zip(eid[order], np.round(val[order].cumsum(), 2)))
    got = dict(zip(out["event_id"], out["running"]))
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, k


@pytest.mark.parametrize("seed,w", [(5, 3), (6, 7)])
def test_rolling_actives_matches_bruteforce(tmp_path, seed, w):
    from sotohp_ray.pipelines.relational import (
        events_rolling_active_users,
    )

    rng = np.random.RandomState(seed)
    d = tmp_path / "sf"
    d.mkdir()
    n = 300
    base = np.datetime64("2024-02-01T06:00:00", "us")
    day = rng.randint(0, 20, n)
    user = rng.randint(0, 25, n).astype(np.int64)
    _write(d, "events", pa.table({
        "user_id": pa.array(user),
        "ts": pa.array(base + day * np.timedelta64(86400, "s"),
                       pa.timestamp("us")),
    }))
    out = events_rolling_active_users(str(d), window_days=w) \
        .to_pandas()
    lo, hi = int(day.min()), int(day.max())
    want = {}
    for g in range(lo, hi + 1):
        want[g] = len(set(user[(day >= g - w + 1) & (day <= g)]))
    base_day = int(out["day"].min())
    got = {int(r.day) - base_day + lo: int(r.active_users)
           for r in out.itertuples()}
    assert got == want


@pytest.mark.parametrize("seed", [7, 8])
def test_semdedup_matches_bruteforce_rule(tmp_path, seed):
    from sotohp_ray.pipelines.ann import _normalize, semdedup

    rng = np.random.RandomState(seed)
    d = tmp_path / "sf"
    d.mkdir()
    n, dim, k, tau = 80, 8, 3, 0.9
    X = rng.normal(0, 1, (n, dim))
    # plant duplicate groups
    for _ in range(10):
        i, j = rng.randint(0, n, 2)
        X[j] = X[i] + rng.normal(0, 0.01, dim)
    _write(d, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(
            [row.astype(np.float32).tolist() for row in X],
            pa.list_(pa.float32())),
        "label": pa.array(np.zeros(n, np.int32)),
    }))
    out = semdedup(str(d), n_clusters=k, tau=tau).to_pandas()
    # brute force the documented rule
    Xn = _normalize(X.astype(np.float64))
    C = _normalize(X[:k].astype(np.float64))
    S = np.round(Xn @ C.T, 5)
    cl = np.argmax(S, axis=1)
    P = np.round(Xn @ Xn.T, 5)
    keep = []
    for x in range(n):
        drop = any(
            cl[y] == cl[x] and P[x, y] >= tau for y in range(x)
        )
        if not drop:
            keep.append((x, int(cl[x])))
    assert list(zip(out["vec_id"], out["cluster"])) == keep


@pytest.mark.parametrize("seed", [9])
def test_cohort_ltv_matches_pandas(tmp_path, seed):
    from sotohp_ray.pipelines.relational import customer_cohort_ltv

    rng = np.random.RandomState(seed)
    d = tmp_path / "sf"
    d.mkdir()
    n = 500
    base = np.datetime64("2022-06-01", "us")
    ck = rng.randint(0, 40, n).astype(np.int64)
    od = base + rng.randint(0, 700, n) * np.timedelta64(1, "D")
    tp = np.round(rng.uniform(1, 500, n), 2)
    _write(d, "orders", pa.table({
        "o_custkey": pa.array(ck),
        "o_orderdate": pa.array(od, pa.timestamp("us")),
        "o_totalprice": pa.array(tp, pa.float64()),
    }))
    out = customer_cohort_ltv(str(d)).to_pandas()
    mon = od.astype("datetime64[M]").astype(np.int64)
    df = pd.DataFrame({"ck": ck, "mon": mon,
                       "cents": np.round(tp * 100).astype(np.int64)})
    df["first"] = df.groupby("ck")["mon"].transform("min")
    df["age"] = df["mon"] - df["first"]
    df["cohort"] = [
        f"{m // 12 + 1970:04d}-{m % 12 + 1:02d}" for m in df["first"]]
    want = df.groupby(["cohort", "age"]).agg(
        n=("ck", "size"), rev=("cents", "sum")).reset_index()
    got = out.rename(columns={
        "cohort_month": "cohort", "age_months": "age",
        "n_orders": "n", "revenue_cents": "rev"})
    want = want.sort_values(["cohort", "age"]).reset_index(drop=True)
    got = got[["cohort", "age", "n", "rev"]].sort_values(
        ["cohort", "age"]).reset_index(drop=True)
    assert got.astype({"age": "int64", "n": "int64",
                       "rev": "int64"}).equals(
        want.astype({"age": "int64", "n": "int64", "rev": "int64"}))
