"""GTFS transportation operators (SURVEY.md §2.5) — near-verbatim Spark SQL
ports of the reference's DuckDB pipeline
(/root/reference/city2graph/transportation.py):

- T5 active dates   — transportation.py:130-190 (calendar date range ×
  weekday bits, plus calendar_dates type-1 additions minus type-2 removals)
- service counts    — transportation.py:921-985 (distinct active days)
- freq multipliers  — transportation.py:660-714 (Σ max(1,⌊(end−start)/headway⌋)
  per trip; non-frequency trips = 1)
- T3 get_od_pairs   — transportation.py:717-875 (LEAD over stop_sequence,
  expansion over active dates, timestamps, undirected swap of ids AND times)
- T4 travel_summary_graph — transportation.py:1040-1160
  (travel_time_sec = Σ(tt·sc)/Σ(sc), frequency = Σ(sc); time-window filters;
  undirected merge re-weights the average)

All-varchar inputs (GTFS contract): every cast is explicit and NULL-guarded
exactly like the reference's try_cast paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

GTFS_FILES = ["stops", "trips", "stop_times", "calendar", "calendar_dates",
              "frequencies", "routes"]


def time_to_seconds(col: Column) -> Column:
    """GTFS HH:MM:SS (hours may exceed 24) → seconds; invalid → NULL.
    Port of transportation.py:428-470."""
    s = F.trim(col.cast("string"))
    ok = s.rlike(r"^\d+:\d{1,2}:\d{1,2}$")
    parts = F.split(s, ":")
    val = (parts.getItem(0).cast("long") * 3600
           + parts.getItem(1).cast("long") * 60
           + parts.getItem(2).cast("long"))
    return F.when(ok, val).otherwise(F.lit(None).cast("long"))


def load_gtfs(spark: SparkSession, csv_dir: str) -> dict[str, DataFrame]:
    """T1: directory of GTFS ``.txt``/``.csv`` members → all-varchar
    DataFrames (the reference loads every column as VARCHAR,
    transportation.py:550)."""
    import os
    out = {}
    for name in GTFS_FILES:
        for ext in (".txt", ".csv"):
            p = os.path.join(csv_dir, name + ext)
            if os.path.exists(p):
                out[name] = spark.read.option("header", True) \
                    .option("inferSchema", False).csv(p)
                break
    return out


def build_active_dates(calendar: DataFrame | None,
                       calendar_dates: DataFrame | None,
                       start_date: str, end_date: str) -> DataFrame:
    """T5: (service_id, active_date) over [start,end] — weekly calendar bits
    ∪ type-1 exceptions − type-2 exceptions (transportation.py:130-190)."""
    spark = (calendar or calendar_dates).sparkSession
    base = None
    if calendar is not None:
        days = spark.range(1).select(F.explode(F.sequence(
            F.to_date(F.lit(start_date), "yyyyMMdd"),
            F.to_date(F.lit(end_date), "yyyyMMdd"))).alias("d"))
        dow = F.dayofweek(F.col("d"))  # Sun=1 … Sat=7
        flag = (F.when(dow == 2, F.col("monday"))
                 .when(dow == 3, F.col("tuesday"))
                 .when(dow == 4, F.col("wednesday"))
                 .when(dow == 5, F.col("thursday"))
                 .when(dow == 6, F.col("friday"))
                 .when(dow == 7, F.col("saturday"))
                 .otherwise(F.col("sunday"))).cast("int")
        base = (calendar.crossJoin(days)
                .where(F.col("d").between(
                    F.to_date(F.col("start_date"), "yyyyMMdd"),
                    F.to_date(F.col("end_date"), "yyyyMMdd")))
                .where(flag == 1)
                .select("service_id", F.col("d").alias("active_date")))
    if calendar_dates is not None:
        parsed = calendar_dates.select(
            "service_id", F.to_date(F.col("date"), "yyyyMMdd").alias("active_date"),
            F.col("exception_type").cast("int").alias("_et"))
        adds = parsed.where((F.col("_et") == 1)
                            & F.col("active_date").between(
                                F.to_date(F.lit(start_date), "yyyyMMdd"),
                                F.to_date(F.lit(end_date), "yyyyMMdd"))) \
            .select("service_id", "active_date")
        base = adds if base is None else base.unionByName(adds)
        removes = parsed.where(F.col("_et") == 2).select("service_id", "active_date")
        base = base.exceptAll(base.join(removes, ["service_id", "active_date"],
                                        "left_semi"))
    return base.dropDuplicates()


def service_counts(active_dates: DataFrame) -> DataFrame:
    return active_dates.groupBy("service_id") \
        .agg(F.countDistinct("active_date").alias("sc"))


def frequency_multipliers(trips: DataFrame,
                          frequencies: DataFrame | None) -> DataFrame:
    """Σ max(1, ⌊(end−start)/headway⌋) per frequency trip; 1 otherwise
    (transportation.py:687-714)."""
    non_freq = trips.select("trip_id").dropDuplicates() \
        .withColumn("multiplier", F.lit(1).cast("long"))
    if frequencies is None:
        return non_freq
    hw = F.col("headway_secs").cast("double")
    ft = (frequencies
          .where(hw.isNotNull() & (hw > 0))
          .withColumn("_m", F.greatest(
              F.lit(1).cast("long"),
              F.floor((time_to_seconds(F.col("end_time"))
                       - time_to_seconds(F.col("start_time"))) / hw)))
          .groupBy("trip_id").agg(F.sum("_m").alias("multiplier")))
    rest = non_freq.join(ft.select("trip_id"), "trip_id", "left_anti")
    return ft.unionByName(rest)


def _stop_legs(stop_times: DataFrame) -> DataFrame:
    """LEAD window over stop_sequence (transportation.py:1055-1080)."""
    w = Window.partitionBy("trip_id").orderBy(F.col("stop_sequence").cast("int"))
    return (stop_times
            .where(F.col("stop_sequence").cast("int").isNotNull())
            .select(
                "trip_id", "stop_id",
                time_to_seconds(F.col("departure_time")).alias("departure_time_sec"),
                F.col("departure_time"),
                F.lead("stop_id").over(w).alias("next_stop_id"),
                F.lead(time_to_seconds(F.col("arrival_time"))).over(w)
                 .alias("next_arrival_time_sec"),
                F.lead("arrival_time").over(w).alias("next_arrival_time")))


def get_od_pairs(stop_times: DataFrame, trips: DataFrame,
                 calendar: DataFrame | None, calendar_dates: DataFrame | None,
                 *, start_date: str, end_date: str,
                 directed: bool = True) -> DataFrame:
    """T3: per-trip consecutive stop pairs expanded over active service
    dates, with absolute timestamps (seconds since epoch; extended >24h GTFS
    times roll into the next day exactly like the reference's _timestamp)."""
    legs = _stop_legs(stop_times).where(F.col("next_stop_id").isNotNull())
    legs = legs.join(trips.select("trip_id", "service_id"), "trip_id")
    dates = build_active_dates(calendar, calendar_dates, start_date, end_date)
    out = (legs.join(dates, "service_id")
           .withColumn("departure_ts",
                       F.unix_timestamp(F.col("active_date").cast("timestamp"))
                       + F.col("departure_time_sec"))
           .withColumn("arrival_ts",
                       F.unix_timestamp(F.col("active_date").cast("timestamp"))
                       + F.col("next_arrival_time_sec"))
           .where(F.col("departure_ts").isNotNull()
                  & F.col("arrival_ts").isNotNull())
           .select("trip_id", "service_id",
                   F.col("stop_id").alias("orig_stop_id"),
                   F.col("next_stop_id").alias("dest_stop_id"),
                   F.date_format("active_date", "yyyy-MM-dd").alias("date"),
                   "departure_ts", "arrival_ts",
                   (F.col("arrival_ts") - F.col("departure_ts"))
                   .alias("travel_time_sec")))
    if not directed:
        swap = F.col("orig_stop_id") > F.col("dest_stop_id")
        out = out.select(
            "trip_id", "service_id",
            F.when(swap, F.col("dest_stop_id")).otherwise(F.col("orig_stop_id"))
             .alias("orig_stop_id"),
            F.when(swap, F.col("orig_stop_id")).otherwise(F.col("dest_stop_id"))
             .alias("dest_stop_id"),
            "date",
            F.when(swap, F.col("arrival_ts")).otherwise(F.col("departure_ts"))
             .alias("departure_ts"),
            F.when(swap, F.col("departure_ts")).otherwise(F.col("arrival_ts"))
             .alias("arrival_ts"),
            "travel_time_sec")
    return out


def travel_summary_graph(stop_times: DataFrame, trips: DataFrame,
                         stops: DataFrame | None = None,
                         calendar: DataFrame | None = None,
                         calendar_dates: DataFrame | None = None,
                         frequencies: DataFrame | None = None,
                         *, start_date: str, end_date: str,
                         min_departure_sec: float | None = None,
                         max_arrival_sec: float | None = None,
                         directed: bool = True) -> DataFrame:
    """T4: aggregated stop-pair edges — travel_time_sec = Σ(tt·sc)/Σ(sc),
    frequency = Σ(sc) with sc = active-days × frequencies multiplier
    (transportation.py:1109-1117); undirected merge re-weights the average
    (1144-1156).  Straight stop-to-stop geometry is returned as lon/lat
    endpoint columns when ``stops`` is given."""
    legs = _stop_legs(stop_times).where(
        F.col("next_stop_id").isNotNull()
        & F.col("departure_time_sec").isNotNull()
        & F.col("next_arrival_time_sec").isNotNull())
    if min_departure_sec is not None:
        legs = legs.where(F.col("departure_time_sec") >= float(min_departure_sec))
    if max_arrival_sec is not None:
        legs = legs.where(F.col("next_arrival_time_sec") <= float(max_arrival_sec))
    legs = legs.withColumn(
        "travel_time", F.col("next_arrival_time_sec") - F.col("departure_time_sec")) \
        .where(F.col("travel_time") > 0)

    sc = service_counts(build_active_dates(calendar, calendar_dates,
                                           start_date, end_date)) \
        if (calendar is not None or calendar_dates is not None) \
        else trips.select("service_id").dropDuplicates().withColumn("sc", F.lit(1))
    fm = frequency_multipliers(trips, frequencies)

    valid = (legs.join(trips.select("trip_id", "service_id"), "trip_id")
             .join(sc, "service_id").join(fm, "trip_id")
             .where(F.col("sc") > 0)
             .withColumn("service_count", F.col("sc") * F.col("multiplier")))
    agg = (valid.groupBy(F.col("stop_id").alias("from_stop_id"),
                         F.col("next_stop_id").alias("to_stop_id"))
           .agg((F.sum(F.col("travel_time") * F.col("service_count"))
                 / F.sum("service_count")).alias("travel_time_sec"),
                F.sum("service_count").cast("long").alias("frequency")))

    if not directed:
        swap = F.col("from_stop_id") > F.col("to_stop_id")
        canon = agg.select(
            F.when(swap, F.col("to_stop_id")).otherwise(F.col("from_stop_id"))
             .alias("from_stop_id"),
            F.when(swap, F.col("from_stop_id")).otherwise(F.col("to_stop_id"))
             .alias("to_stop_id"),
            "travel_time_sec", "frequency")
        agg = (canon
               .withColumn("_wtt", F.col("travel_time_sec") * F.col("frequency"))
               .groupBy("from_stop_id", "to_stop_id")
               .agg((F.sum("_wtt") / F.sum("frequency")).alias("travel_time_sec"),
                    F.sum("frequency").alias("frequency")))

    if stops is not None:
        s = stops.select(F.col("stop_id"),
                         F.col("stop_lon").cast("double").alias("lon"),
                         F.col("stop_lat").cast("double").alias("lat"))
        agg = (agg
               .join(s.select(F.col("stop_id").alias("from_stop_id"),
                              F.col("lon").alias("from_lon"),
                              F.col("lat").alias("from_lat")),
                     "from_stop_id", "left")
               .join(s.select(F.col("stop_id").alias("to_stop_id"),
                              F.col("lon").alias("to_lon"),
                              F.col("lat").alias("to_lat")),
                     "to_stop_id", "left"))
    return agg


def load_gbfs(spark: SparkSession, json_dir: str) -> dict[str, DataFrame]:
    """T2 (transportation.py:573-646): GBFS JSON directory → one DataFrame
    per feed file, flattening data.stations/bikes/vehicles/vehicle_types/
    feeds (else the data object itself); lat/lon materialise a geometry
    struct.  Feed files are small metadata — parsed like the reference
    (driver JSON), the row payload becomes a distributed DataFrame."""
    import json
    import os
    out: dict[str, DataFrame] = {}
    for root, _, files in os.walk(json_dir):
        for fname in sorted(files):
            if not fname.endswith(".json"):
                continue
            with open(os.path.join(root, fname), encoding="utf-8") as f:
                try:
                    raw = json.load(f)
                except json.JSONDecodeError:
                    continue
            data = raw.get("data", {})
            rows = None
            for key in ("stations", "bikes", "vehicles", "vehicle_types",
                        "feeds"):
                if key in data:
                    rows = data[key]
                    break
            if rows is None:
                rows = [data]
            if not rows:
                continue
            name = os.path.splitext(fname)[0].replace("-", "_").lower()
            df = spark.createDataFrame(
                [{k: (str(v) if v is not None else None) for k, v in r.items()}
                 for r in rows])
            if {"lat", "lon"}.issubset(set(df.columns)):
                df = df.withColumn(
                    "geometry",
                    F.when(F.col("lon").cast("double").isNotNull()
                           & F.col("lat").cast("double").isNotNull(),
                           F.struct(F.col("lon").cast("double").alias("lon"),
                                    F.col("lat").cast("double").alias("lat"))))
            out[name] = df
    return out
