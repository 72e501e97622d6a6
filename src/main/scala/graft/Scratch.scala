package graft

/** Shuffle/spill scratch-directory selection for the measured entry points
  * (r14). Spark's shuffle writers pay a fixed per-map-task filesystem cost
  * (BypassMergeSortShuffleWriter opens one temp file per reduce partition,
  * then merges into data+index files — ~R+2 creates/closes per map task,
  * each with a compression-stream setup); on this host's ext4 root that
  * measured ~60–100 ms of shuffle-write time PER MAP TASK regardless of
  * payload (1.5 KB exchanges showed 1.8–2.7 s of summed write time across
  * 32 tasks), which multiplied by the ~15 sequential exchanges of a typical
  * inventory key dominated sub-second queries. Pointing spark.local.dir at
  * a tmpfs (/dev/shm, 128 GiB on this box) removes the filesystem latency:
  * measured q211 1.50→0.95 s, q256 1.84→1.10 s, q210 3.06→2.41 s min-of-5.
  *
  * Production analogue: provisioning fast local NVMe for shuffle scratch
  * (optimization guide §2.1 — local disk bandwidth for shuffle can be the
  * tighter limit; §9 assumes machines with fast local disks). This is an
  * environment provisioning choice, not a semantics change: shuffle files
  * are transient per-JVM state and Spark cleans its unique spark-<uuid>
  * subdirectory on exit.
  *
  * Env contract: `SPARK_GRAFT_LOCAL_DIR=<path>` forces a directory,
  * `SPARK_GRAFT_LOCAL_DIR=` (empty) disables the override entirely, unset
  * picks /dev/shm when it is writable with ≥8 GiB usable (the bench's
  * shuffles are MBs; deep Scale probes which deliberately measure the
  * disk-spill regime do NOT use this helper). A caller-set
  * SPARK_LOCAL_DIRS always wins — Spark ignores spark.local.dir then. */
object Scratch {
  def localDir: Option[String] = sys.env.get("SPARK_GRAFT_LOCAL_DIR") match {
    case Some("") => None
    case Some(p) => Some(p)
    case None =>
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite &&
          shm.getUsableSpace >= 8L * 1024 * 1024 * 1024) {
        val sub = new java.io.File(shm, "graft-local")
        sub.mkdirs()
        Some(sub.getAbsolutePath)
      } else None
  }

  /** Apply to a session builder: set spark.local.dir when a fast scratch
    * dir is available, else leave the JVM default. */
  def configure(b: org.apache.spark.sql.SparkSession.Builder)
      : org.apache.spark.sql.SparkSession.Builder =
    localDir.fold(b)(d => b.config("spark.local.dir", d))
}
