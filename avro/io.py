class DatumReader:
    """Marker object (the real package's record decoder); decoding happens in
    hail_tpu.io.avro."""
