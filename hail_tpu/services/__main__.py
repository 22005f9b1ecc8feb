"""Run the Auth service: python -m hail_tpu.services
(reference auth/auth/__main__.py)."""

import argparse
import asyncio

from .auth_service import AuthService


def main() -> int:
    p = argparse.ArgumentParser(prog='hail_tpu.services')
    p.add_argument('--port', type=int, default=5000)
    p.add_argument('--db', default='auth.db')
    p.add_argument('--initial-developer', default='dev')
    args = p.parse_args()

    async def run():
        svc = AuthService(port=args.port, db_path=args.db,
                          initial_developer=args.initial_developer)
        port = await svc.start()
        print(f'auth service listening on http://127.0.0.1:{port}',
              flush=True)
        try:
            await asyncio.Event().wait()
        finally:
            await svc.stop()

    asyncio.run(run())
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
