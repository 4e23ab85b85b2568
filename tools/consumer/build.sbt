// Minimal consumer of the published graft library — the packaging
// proof: a third-party sbt project that resolves the publishLocal
// artifact and drives the schema-evolution and dedup surfaces.
// Build with ../consumer_check.sh (publishLocal in the main repo
// first).
ThisBuild / scalaVersion := "2.13.17"
name := "graft-consumer"
// Spark ships unmanaged with the image, exactly as in the library
unmanagedBase := file("/opt/spark/jars")
// the library itself resolves from the local ivy repository
// (publishLocal); COURSIER_MODE=offline includes ivyLocal
libraryDependencies += "icebergevolvespark" %% "icebergevolvespark" % "0.1.0"
run / fork := true
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  "-Dfile.encoding=UTF-8",
  "-Xmx2g",
)
