"""Run the Batch service: python -m hail_tpu.batch_service
(reference batch front_end/driver entrypoints, one process here)."""

import argparse
import asyncio

from .service import BatchService


def main() -> int:
    p = argparse.ArgumentParser(prog='hail_tpu.batch_service')
    p.add_argument('--port', type=int, default=5050)
    p.add_argument('--workers', type=int, default=4)
    p.add_argument('--data-dir', default=None)
    p.add_argument('--auth-url', default=None,
                   help='AuthService base URL; enables bearer-token auth')
    args = p.parse_args()

    async def run():
        svc = BatchService(port=args.port, n_workers=args.workers,
                           data_dir=args.data_dir, auth_url=args.auth_url)
        port = await svc.start()
        print(f'batch service listening on http://127.0.0.1:{port} '
              f'(data: {svc.data_dir})', flush=True)
        try:
            await asyncio.Event().wait()
        finally:
            await svc.stop()

    asyncio.run(run())
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
