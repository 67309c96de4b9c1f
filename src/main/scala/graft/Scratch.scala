package graft

/** Per-process scratch root for anything that writes then re-reads files
  * (ORC/JSON/CSV sinks, IVF index layouts, synthesized fixtures): two
  * concurrent graft processes on one machine must never race on a shared
  * fixed path. The pid is baked into paths (and into oracle SQL built in the
  * same JVM); files are left behind on exit because the driver's DuckDB
  * oracle reads them AFTER this process ends. */
object Scratch {
  val root: String = s"/tmp/graft_${ProcessHandle.current().pid()}"
}
