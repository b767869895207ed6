from ent_fins_lakehouse_spark.streaming.autoloader import LakeStreamSink, ingest_file_stream, run_available_now

__all__ = ["LakeStreamSink", "ingest_file_stream", "run_available_now"]
