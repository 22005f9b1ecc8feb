"""DataFileReader over hail_tpu's native Avro decoder."""

import io as _io
import os
import tempfile


class DataFileReader:
    def __init__(self, reader, datum_reader=None):
        from hail_tpu.io import avro as _avro
        if isinstance(reader, (str, os.PathLike)):
            path = os.fspath(reader)
            self._tmp = None
        else:
            # file-like: spill to a temp file for the path-based decoder
            data = reader.read()
            if isinstance(data, str):
                data = data.encode()
            self._tmp = tempfile.NamedTemporaryFile(suffix='.avro', delete=False)
            self._tmp.write(data)
            self._tmp.flush()
            path = self._tmp.name
            reader.close()
        _, rows = _avro.read_avro_file(path)

        def plain(v):
            from hail_tpu.utils.structs import Struct
            if isinstance(v, Struct):
                return {k: plain(x) for k, x in v.items()}
            if isinstance(v, list):
                return [plain(x) for x in v]
            return v
        self._rows = [plain(r) for r in rows]

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __iter__(self):
        return iter(self._rows)

    def close(self):
        if self._tmp is not None:
            try:
                os.unlink(self._tmp.name)
            except OSError:
                pass
            self._tmp = None
