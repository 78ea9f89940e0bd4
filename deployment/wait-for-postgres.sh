#!/bin/sh
# Block until Postgres accepts a connection, then exec the given command.
# Reference parity: deployment/wait-for-postgres.sh:7-10 polls with psql;
# this engine ships its own wire-protocol client (sources/pgwire.py), so
# the probe is a one-line Python connect — no psql in the image.

set -e

cmd="$@"

until python3 -c "
from postgresimporter_spark.sources.jdbc import DbOptions
from postgresimporter_spark.sources.pgwire import connect
connect(DbOptions()).close()
" 2>/dev/null; do
  >&2 echo "Postgres is unavailable - sleeping"
  sleep 1
done

>&2 echo "Postgres is up - executing command"
exec $cmd
