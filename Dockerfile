# Container image for the Spark-native importer (reference parity: E2,
# /root/reference/Dockerfile — there the image bundles pgfutter + psql;
# here the engine is pure PySpark and speaks the Postgres COPY wire
# protocol itself, so the only runtime deps are a JVM and pyspark).
#
# Build:  docker build -t postgresimporter-spark .
# Run:    see deployment/README.md (compose bring-up)

FROM eclipse-temurin:17-jre-jammy

RUN apt-get update \
    && apt-get install -y --no-install-recommends python3 python3-pip \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app

# pyspark pulls its own Spark distribution; pin to the tested line
RUN pip3 install --no-cache-dir pyspark==4.1.2 pyarrow pandas numpy

ENV DB_HOST=postgres \
    DB_PORT=5432 \
    DB_USER=postgres \
    DB_PASSWORD=password \
    DB_NAME=postgres

COPY postgresimporter_spark/ /app/postgresimporter_spark
COPY deployment/wait-for-postgres.sh /app/

# same contract as the reference entrypoint: block until the database
# accepts connections, then run the import CLI against the mounted
# source directory (compose mounts it at /import)
ENTRYPOINT ["/bin/sh", "./wait-for-postgres.sh", "python3", "-m", "postgresimporter_spark"]
