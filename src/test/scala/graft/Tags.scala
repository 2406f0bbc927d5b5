package graft

/** Deep/slow test marker. `sbt test` EXCLUDES tests tagged Slow (see
  * build.sbt) so the default suite finishes inside the driver's time budget
  * (the r15 driver run timed out mid-suite and reported `tests_ok: false`
  * with zero failures — r15 verdict item 1b). The full battery still runs
  * with `SPARK_GRAFT_TEST_FULL=1 sbt test`, which is how the builder gates
  * every round close-out; the tagged tests are the long differential /
  * property sweeps, whose fixed-seed corners are separately covered by fast
  * untagged tests.
  */
object Slow extends org.scalatest.Tag("graft.Slow")
