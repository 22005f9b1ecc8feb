from hail_tpu.services.httpx_client import (  # noqa: F401
    ClientResponse, ClientResponseError, ClientSession, client_session)
