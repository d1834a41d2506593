"""``python -m aprs2influxdb_spark`` entry point, mirroring the
reference's ``python -m aprs2influxdb`` (:1209-1210)."""

from aprs2influxdb_spark.cli import main

if __name__ == "__main__":
    main()
