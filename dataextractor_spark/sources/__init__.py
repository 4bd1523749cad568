"""Source connectors. REST is the reference's native source
(opendotaapi.py); Parquet/JSON scans come from Spark built-ins via the
catalog."""
