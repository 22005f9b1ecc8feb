"""pyspark.sql stand-in (see package docstring). Row mirrors the real
kwargs-record constructor so module-level references resolve."""


class Row(dict):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k) from None


class SparkSession:
    def __init__(self, *a, **kw):
        raise NotImplementedError('no Spark in hail_tpu (XLA execution tier)')


class DataFrame:
    def __init__(self, *a, **kw):
        raise NotImplementedError('no Spark in hail_tpu (XLA execution tier)')
