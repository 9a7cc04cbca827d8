from consensource_sds_spark.codec.messages import decode_message, encode_message

__all__ = ["decode_message", "encode_message"]
