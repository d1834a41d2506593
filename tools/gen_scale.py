"""Generate larger scale factors of the driver's synthetic tables —
for SCALE-CURVE measurement only (the correctness gate stays on the
driver's own /root/testdata parquet, which this script never touches).

The driver ships sf0.001/0.01/0.1; the round-3 verdict asks for a
measured 10x curve ("demonstrate the scale curve, don't just gate the
shape").  This generator emits an sfN directory with the same schemas
and the distribution families that drive operator cost:

- row counts linear in sf (sf1 = 10x sf0.1 in every table)
- documents: tokens drawn i.i.d. from the EMPIRICAL sf0.1 unigram
  distribution (so shingle/document-frequency statistics — which set
  dedup/LSH candidate density — scale like the real corpus), doc
  lengths from the empirical length distribution, ~1% planted
  near-dups and ~0.15% exact dups matching the sf0.1 dup density
- embeddings: 64-dim near-random vectors, 10 labels (the hardest ANN
  recall case, like the driver's)
- events: 5 event types, exponential values with per-(user,hour)
  mean profiles in ~[20, 80] (keeps DTW/PAA cohorts and hourly
  windows non-vacuous), 30-day January 2024 span, 15 users per sf-k
- TPC-H-ish relational tables with the sf0.1 ranges (dates, flags,
  4 lineitems/order, 10% customers order-less etc. approximated)

Deterministic: single numpy PCG64 seeded from --seed (default 42).

Usage:  python tools/gen_scale.py 1 [outdir]   # sf1 -> ./scaledata/sf1
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = {  # rows at sf=0.1 (the driver's sf0.1 counts)
    "customer": 15_000, "supplier": 1_000, "part": 20_000,
    "orders": 150_000, "lineitem": 600_000, "events": 100_000,
    "documents": 5_000, "embeddings": 2_000, "users": 1_500,
}

LANGS = (["en"] * 28 + ["zh"] * 11 + ["es"] * 11 + ["fr"] * 11 + ["de"] * 10)
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def _empirical_docs_dist():
    """Unigram token frequencies + length quantiles from the driver's
    sf0.1 documents table (read-only)."""
    import duckdb

    con = duckdb.connect()
    toks = con.execute(
        "SELECT tok, count(*) FROM (SELECT unnest(string_split(text, ' ')) AS tok "
        "FROM '/root/testdata/sf0.1/documents.parquet') GROUP BY 1 ORDER BY 2 DESC"
    ).fetchall()
    lens = con.execute(
        "SELECT len(string_split(text, ' ')) FROM '/root/testdata/sf0.1/documents.parquet'"
    ).fetchnumpy()
    vocab = [t for t, _ in toks]
    freq = np.array([c for _, c in toks], dtype="float64")
    return vocab, freq / freq.sum(), list(lens.values())[0].astype("int64")


def gen(sf: float, out: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    k = sf / 0.1
    n = {t: int(c * k) for t, c in BASE.items()}
    os.makedirs(out, exist_ok=True)

    def write(name, **cols):
        pq.write_table(pa.table(cols), os.path.join(out, f"{name}.parquet"))
        print(f"  {name}: {len(next(iter(cols.values())))} rows")

    # dims — region/nation are fixed-cardinality like TPC-H
    write("region", r_regionkey=np.arange(5, dtype="int64"),
          r_name=np.array(["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]))
    nk = np.arange(25, dtype="int64")
    write("nation", n_nationkey=nk, n_name=np.array([f"NATION_{i}" for i in nk]),
          n_regionkey=(nk % 5).astype("int64"))

    nc = n["customer"]
    write("customer",
          c_custkey=np.arange(nc, dtype="int64"),
          c_name=np.array([f"Customer#{i:09d}" for i in range(nc)]),
          c_nationkey=rng.integers(0, 25, nc),
          c_acctbal=np.round(rng.uniform(-999.99, 9999.99, nc), 2),
          c_mktsegment=rng.choice(SEGMENTS, nc))

    ns = n["supplier"]
    write("supplier",
          s_suppkey=np.arange(ns, dtype="int64"),
          s_name=np.array([f"Supplier#{i:09d}" for i in range(ns)]),
          s_nationkey=rng.integers(0, 25, ns),
          s_acctbal=np.round(rng.uniform(-999.99, 9999.99, ns), 2))

    npart = n["part"]
    # literal conventions MUST match the driver's gate tables (review
    # r7: the first cut wrote 'ECONOMY TIN' / 'NATION_05', so every
    # query filtering p_type = 'ECONOMY' or n_name = 'NATION_5'
    # (market_share, waiting_supplier, …) was DEGENERATE on scaledata):
    # single-word uppercase p_type, Brand#1..25, two-word p_name with
    # 'large'/'widget' present for the LIKE filters
    adjs = ["small", "large", "economy", "standard", "promo", "medium"]
    nouns = ["ring", "bolt", "widget", "cog", "plate"]
    write("part",
          p_partkey=np.arange(npart, dtype="int64"),
          p_name=np.array([f"{adjs[i % 6]} {nouns[(i * 3) % 5]}" for i in range(npart)]),
          p_brand=np.array([f"Brand#{(i % 25) + 1}" for i in range(npart)]),
          p_type=np.array([adjs[(i * 7) % 6].upper() for i in range(npart)]),
          p_size=rng.integers(1, 51, npart),
          p_retailprice=np.round(900 + (np.arange(npart) % 200) + rng.uniform(0, 100, npart), 2))

    no = n["orders"]
    odate = (np.datetime64("1995-01-01") + rng.integers(0, 2405, no)).astype("datetime64[D]")
    write("orders",
          o_orderkey=np.arange(no, dtype="int64"),
          o_custkey=rng.integers(0, nc, no),
          o_orderstatus=rng.choice(["F", "O", "P"], no),
          o_totalprice=np.round(rng.uniform(850.0, 450_000.0, no), 2),
          o_orderdate=odate,
          o_orderpriority=rng.choice(PRIORITIES, no))

    nl = n["lineitem"]
    l_ok = rng.integers(0, no, nl)  # ~4 lines/order in expectation
    l_ok.sort()
    sdate = odate[l_ok].astype("datetime64[D]") + rng.integers(1, 122, nl)
    # per-order line sequence (1..k): (l_orderkey, l_linenumber) must be
    # UNIQUE or it stops being a deterministic tie-break downstream
    starts = np.r_[0, np.flatnonzero(np.diff(l_ok)) + 1]
    run_starts = np.repeat(starts, np.diff(np.r_[starts, nl]))
    l_ln = (np.arange(nl) - run_starts + 1).astype("int64")
    write("lineitem",
          l_orderkey=l_ok,
          l_partkey=rng.integers(0, npart, nl),
          l_suppkey=rng.integers(0, ns, nl),
          l_linenumber=l_ln,
          l_quantity=rng.integers(1, 51, nl).astype("float64"),
          l_extendedprice=np.round(rng.uniform(900.0, 100_000.0, nl), 2),
          l_discount=np.round(rng.integers(0, 11, nl) / 100.0, 2),
          l_tax=np.round(rng.integers(0, 9, nl) / 100.0, 2),
          l_returnflag=rng.choice(["A", "N", "R"], nl),
          l_linestatus=rng.choice(["F", "O"], nl),
          l_shipdate=sdate)

    ne, nu = n["events"], n["users"]
    ts = (np.datetime64("2024-01-01T00:00:00", "us")
          + rng.integers(0, 30 * 86_400_000_000, ne).astype("timedelta64[us]"))
    user = rng.integers(0, nu, ne)
    hour = (ts.astype("datetime64[h]").astype("int64")) % 24
    # per-(user,hour) mean profile in ~[20, 80]: hashed phase offsets
    mean = 20.0 + 60.0 * ((user * 7 + hour * 13) % 57) / 56.0
    value = np.round(rng.exponential(1.0, ne) * mean * (50.0 / 49.5) * 0.99, 2)
    write("events",
          event_id=np.arange(ne, dtype="int64"),
          ts=ts,
          user_id=user,
          event_type=rng.choice(EVENT_TYPES, ne),
          value=value,
          props=np.array([json.dumps({"k": int(v)}) for v in rng.integers(0, 100, ne)]))

    nd = n["documents"]
    vocab, probs, lens = _empirical_docs_dist()
    lengths = rng.choice(lens, nd)
    texts: list[str] = []
    varr = np.array(vocab)
    for i in range(nd):
        if i > 0 and i % 640 == 639:      # ~0.15% exact dups
            texts.append(texts[rng.integers(0, i)])
            continue
        toks = varr[rng.choice(len(vocab), lengths[i], p=probs)]
        if i > 0 and i % 100 == 99:       # ~1% near-dups: mutate ~10%
            src = texts[rng.integers(0, i)].split(" ")
            m = max(1, len(src) // 10)
            for j in rng.choice(len(src), m):
                src[j] = vocab[rng.integers(0, len(vocab))]
            toks = np.array(src)
        texts.append(" ".join(toks))
    write("documents",
          doc_id=np.arange(nd, dtype="int64"),
          text=np.array(texts, dtype=object),
          lang=np.array([LANGS[i % len(LANGS)] for i in range(nd)]),
          source=np.array([f"src{i % 5}" for i in range(nd)]),
          n_chars=np.array([len(t) for t in texts], dtype="int32"))

    nv = n["embeddings"]
    emb = rng.normal(0, 1, (nv, 64)).astype("float32")
    write("embeddings",
          vec_id=np.arange(nv, dtype="int64"),
          embedding=pa.array(list(emb), type=pa.list_(pa.float32())),
          label=rng.integers(0, 10, nv))


def gen_docs_fast(sf: float, out: str, seed: int = 42) -> None:
    """Vectorized documents+embeddings-only generator for the BIG
    scale decades (sf100 ≈ 18 GB): the full :func:`gen` samples each
    document's tokens in a Python loop (fine to sf10, hours at sf100).
    Here every chunk's tokens come from ONE ``rng.choice`` draw over
    the same empirical sf0.1 unigram/length distributions, streamed
    through a ParquetWriter in 50k-doc chunks so peak memory stays
    bounded.  Same dup densities (~0.15% exact, ~1% near with ~10%
    token mutation); dup SOURCES are drawn from the current chunk
    (a locality simplification the curve doesn't care about — dedup
    candidate density is set by the df/shingle statistics, which the
    shared unigram distribution preserves)."""
    rng = np.random.default_rng(seed)
    k = sf / 0.1
    nd, nv = int(BASE["documents"] * k), int(BASE["embeddings"] * k)
    os.makedirs(out, exist_ok=True)
    vocab, probs, lens = _empirical_docs_dist()
    varr = np.array(vocab)
    chunk = 50_000
    schema = pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
        ("source", pa.string()), ("n_chars", pa.int32()),
    ])
    writer = pq.ParquetWriter(os.path.join(out, "documents.parquet"), schema)
    done = 0
    while done < nd:
        m = min(chunk, nd - done)
        lengths = rng.choice(lens, m)
        flat = varr[rng.choice(len(vocab), int(lengths.sum()), p=probs)]
        offs = np.concatenate(([0], np.cumsum(lengths)))
        texts = [" ".join(flat[offs[i]:offs[i + 1]]) for i in range(m)]
        for i in range(m):
            gid = done + i
            if gid > 0 and gid % 640 == 639:
                texts[i] = texts[rng.integers(0, m)]
            elif gid > 0 and gid % 100 == 99:
                src = texts[rng.integers(0, m)].split(" ")
                for j in rng.choice(len(src), max(1, len(src) // 10)):
                    src[j] = vocab[rng.integers(0, len(vocab))]
                texts[i] = " ".join(src)
        writer.write_table(pa.table({
            "doc_id": np.arange(done, done + m, dtype="int64"),
            "text": texts,
            "lang": [LANGS[(done + i) % len(LANGS)] for i in range(m)],
            "source": [f"src{(done + i) % 5}" for i in range(m)],
            "n_chars": np.array([len(t) for t in texts], dtype="int32"),
        }, schema=schema))
        done += m
        if done % 500_000 == 0 or done == nd:
            print(f"  documents: {done}/{nd}", flush=True)
    writer.close()
    eschema = pa.schema([
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
        ("label", pa.int64()),
    ])
    ewriter = pq.ParquetWriter(os.path.join(out, "embeddings.parquet"), eschema)
    done = 0
    while done < nv:
        m = min(200_000, nv - done)
        emb = rng.normal(0, 1, (m, 64)).astype("float32")
        ewriter.write_table(pa.table({
            "vec_id": np.arange(done, done + m, dtype="int64"),
            "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
            "label": rng.integers(0, 10, m),
        }, schema=eschema))
        done += m
    ewriter.close()
    print(f"  embeddings: {nv} rows", flush=True)


def gen_events_fast(sf: float, out: str, seed: int = 42) -> None:
    """Vectorized events-only generator for the BIG scale decades
    (round 6, verdict-r5 item 4: the window/state family needs its
    third measured decade — sf100 events is 100M rows).  Identical
    distribution family to :func:`gen`'s events block (same hourly
    per-(user,hour) mean profile, exponential values, 30-day span,
    users scaling with sf so per-key series length stays ~constant —
    the fleet-of-series scaling model), with the per-row
    ``json.dumps`` props loop replaced by ``np.char`` concatenation
    and the table streamed through a ParquetWriter in 10M-row chunks
    so peak memory stays bounded."""
    rng = np.random.default_rng(seed)
    k = sf / 0.1
    ne, nu = int(BASE["events"] * k), int(BASE["users"] * k)
    os.makedirs(out, exist_ok=True)
    schema = pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string()),
    ])
    writer = pq.ParquetWriter(os.path.join(out, "events.parquet"), schema)
    chunk, done = 10_000_000, 0
    while done < ne:
        m = min(chunk, ne - done)
        ts = (np.datetime64("2024-01-01T00:00:00", "us")
              + rng.integers(0, 30 * 86_400_000_000, m).astype("timedelta64[us]"))
        user = rng.integers(0, nu, m)
        hour = (ts.astype("datetime64[h]").astype("int64")) % 24
        mean = 20.0 + 60.0 * ((user * 7 + hour * 13) % 57) / 56.0
        value = np.round(rng.exponential(1.0, m) * mean * (50.0 / 49.5) * 0.99, 2)
        props = np.char.add(
            np.char.add('{"k": ', rng.integers(0, 100, m).astype("int64").astype(str)),
            "}",
        )
        writer.write_table(pa.table({
            "event_id": np.arange(done, done + m, dtype="int64"),
            "ts": ts,
            "user_id": user,
            "event_type": rng.choice(EVENT_TYPES, m),
            "value": value,
            "props": props,
        }, schema=schema))
        done += m
        print(f"  events: {done}/{ne}", flush=True)
    writer.close()


def gen_rel_dims(sf: float, out: str, seed: int = 42) -> None:
    """The relational DIMENSION tables (region/nation/customer/
    supplier/part), vectorized — callable standalone so the small
    tables can be regenerated (e.g. after a literal-convention fix)
    without redoing the 600M-row fact tables.  Literal conventions
    match the driver's gate tables (review r7: the first cut wrote
    'ECONOMY TIN' / 'NATION_05', so every query filtering
    p_type = 'ECONOMY' or n_name = 'NATION_5' — market_share,
    waiting_supplier, … — was DEGENERATE on scaledata): single-word
    uppercase p_type, Brand#1..25, two-word p_name carrying the
    'large'/'widget' LIKE targets, unpadded NATION_{i}."""
    rng = np.random.default_rng(seed)
    k = sf / 0.1
    n = {t: int(c * k) for t, c in BASE.items()}
    os.makedirs(out, exist_ok=True)

    def write(name, **cols):
        pq.write_table(pa.table(cols), os.path.join(out, f"{name}.parquet"))
        print(f"  {name}: {len(next(iter(cols.values())))} rows", flush=True)

    write("region", r_regionkey=np.arange(5, dtype="int64"),
          r_name=np.array(["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]))
    nk = np.arange(25, dtype="int64")
    write("nation", n_nationkey=nk, n_name=np.array([f"NATION_{i}" for i in nk]),
          n_regionkey=(nk % 5).astype("int64"))

    nc = n["customer"]
    ids = np.arange(nc, dtype="int64")
    write("customer",
          c_custkey=ids,
          c_name=np.char.add("Customer#", np.char.zfill(ids.astype(str), 9)),
          c_nationkey=rng.integers(0, 25, nc),
          c_acctbal=np.round(rng.uniform(-999.99, 9999.99, nc), 2),
          c_mktsegment=np.array(SEGMENTS)[rng.integers(0, 5, nc)])

    ns = n["supplier"]
    ids = np.arange(ns, dtype="int64")
    write("supplier",
          s_suppkey=ids,
          s_name=np.char.add("Supplier#", np.char.zfill(ids.astype(str), 9)),
          s_nationkey=rng.integers(0, 25, ns),
          s_acctbal=np.round(rng.uniform(-999.99, 9999.99, ns), 2))

    npart = n["part"]
    ids = np.arange(npart, dtype="int64")
    adjs = np.array(["small", "large", "economy", "standard", "promo", "medium"])
    nouns = np.array(["ring", "bolt", "widget", "cog", "plate"])
    p_name = np.char.add(np.char.add(adjs[ids % 6], " "), nouns[(ids * 3) % 5])
    p_brand = np.char.add("Brand#", ((ids % 25) + 1).astype(str))
    p_type = np.char.upper(adjs[(ids * 7) % 6])
    write("part",
          p_partkey=ids, p_name=p_name, p_brand=p_brand, p_type=p_type,
          p_size=rng.integers(1, 51, npart),
          p_retailprice=np.round(900 + (ids % 200) + rng.uniform(0, 100, npart), 2))


def gen_rel_fast(sf: float, out: str, seed: int = 42) -> None:
    """Vectorized RELATIONAL-only generator for the BIG scale decades
    (round 7, verdict-r6 item 3: the 22-query join/subquery family —
    the bulk of the analytics surface — was measured only to sf10; at
    sf100 lineitem is 600M rows).  Identical distribution families to
    :func:`gen`'s relational block; per-row Python formatting replaced
    by ``np.char`` vectorization and orders/lineitem streamed through
    ParquetWriters in bounded chunks.  The one cross-chunk dependency
    — lineitem's ship date derives from its order's date — is served
    from an in-memory int32 day array (150M orders ≈ 600 MB), the
    same bounded-driver-state class as the ladder harness itself."""
    rng = np.random.default_rng(seed)
    k = sf / 0.1
    n = {t: int(c * k) for t, c in BASE.items()}
    os.makedirs(out, exist_ok=True)

    def write(name, **cols):
        pq.write_table(pa.table(cols), os.path.join(out, f"{name}.parquet"))
        print(f"  {name}: {len(next(iter(cols.values())))} rows", flush=True)

    gen_rel_dims(sf, out, seed)
    nc, ns, npart = n["customer"], n["supplier"], n["part"]

    # orders: keep the day array for lineitem's ship dates
    no = n["orders"]
    oday = rng.integers(0, 2405, no).astype("int32")  # days since 1995-01-01
    epoch = np.datetime64("1995-01-01")
    oschema = pa.schema([
        ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
        ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
        ("o_orderdate", pa.date32()), ("o_orderpriority", pa.string()),
    ])
    owriter = pq.ParquetWriter(os.path.join(out, "orders.parquet"), oschema)
    statuses, prios = np.array(["F", "O", "P"]), np.array(PRIORITIES)
    chunk, done = 10_000_000, 0
    while done < no:
        m = min(chunk, no - done)
        sl = slice(done, done + m)
        owriter.write_table(pa.table({
            "o_orderkey": np.arange(done, done + m, dtype="int64"),
            "o_custkey": rng.integers(0, nc, m),
            "o_orderstatus": statuses[rng.integers(0, 3, m)],
            "o_totalprice": np.round(rng.uniform(850.0, 450_000.0, m), 2),
            "o_orderdate": (epoch + oday[sl]).astype("datetime64[D]"),
            "o_orderpriority": prios[rng.integers(0, 5, m)],
        }, schema=oschema))
        done += m
        print(f"  orders: {done}/{no}", flush=True)
    owriter.close()

    # lineitem: globally sorted orderkeys + per-order line numbers,
    # computed vectorized over the whole key array, written chunked
    nl = n["lineitem"]
    l_ok = rng.integers(0, no, nl, dtype="int64")
    l_ok.sort(kind="stable")
    newrun = np.empty(nl, dtype=bool)
    newrun[0] = True
    np.not_equal(l_ok[1:], l_ok[:-1], out=newrun[1:])
    starts = np.flatnonzero(newrun)
    run_starts = np.repeat(starts, np.diff(np.r_[starts, nl]))
    l_ln = (np.arange(nl, dtype="int64") - run_starts + 1)
    del newrun, starts, run_starts
    lschema = pa.schema([
        ("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
        ("l_suppkey", pa.int64()), ("l_linenumber", pa.int64()),
        ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
        ("l_discount", pa.float64()), ("l_tax", pa.float64()),
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
        ("l_shipdate", pa.date32()),
    ])
    lwriter = pq.ParquetWriter(os.path.join(out, "lineitem.parquet"), lschema)
    flags, lss = np.array(["A", "N", "R"]), np.array(["F", "O"])
    done = 0
    while done < nl:
        m = min(chunk, nl - done)
        ok = l_ok[done : done + m]
        sday = oday[ok].astype("int64") + rng.integers(1, 122, m)
        lwriter.write_table(pa.table({
            "l_orderkey": ok,
            "l_partkey": rng.integers(0, npart, m),
            "l_suppkey": rng.integers(0, ns, m),
            "l_linenumber": l_ln[done : done + m],
            "l_quantity": rng.integers(1, 51, m).astype("float64"),
            "l_extendedprice": np.round(rng.uniform(900.0, 100_000.0, m), 2),
            "l_discount": np.round(rng.integers(0, 11, m) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, m) / 100.0, 2),
            "l_returnflag": flags[rng.integers(0, 3, m)],
            "l_linestatus": lss[rng.integers(0, 2, m)],
            "l_shipdate": (epoch + sday).astype("datetime64[D]"),
        }, schema=lschema))
        done += m
        print(f"  lineitem: {done}/{nl}", flush=True)
    lwriter.close()


if __name__ == "__main__":
    flags_ = ("--docs-only", "--events-only", "--rel-only")
    args = [a for a in sys.argv[1:] if a not in flags_]
    sf = float(args[0]) if args else 1.0
    out = args[1] if len(args) > 1 else f"scaledata/sf{sf:g}"
    print(f"generating sf{sf:g} -> {out}")
    if "--docs-only" in sys.argv:
        gen_docs_fast(sf, out)
    elif "--events-only" in sys.argv:
        gen_events_fast(sf, out)
    elif "--rel-only" in sys.argv:
        gen_rel_fast(sf, out)
    else:
        gen(sf, out)
