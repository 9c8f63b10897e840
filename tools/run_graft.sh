#!/bin/bash
# Run a graft main directly from compiled classes (bypasses sbt; compile first).
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic; do OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"; done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"; done
# GRAFT_JAVA_OPTS comes AFTER the default -Xmx so a user-supplied -Xmx
# wins (the JVM honors the last flag); SPARK_DRIVER_MEM remains the
# canonical heap knob
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-8g} ${GRAFT_JAVA_OPTS:-} -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/root/repo/src/main/resources:/opt/spark/jars/*" "$@"
