package graft.meta

import java.nio.file.{Files, Paths, StandardCopyOption}

/** (date, page)-granular checkpoint/resume state (ST2).
  *
  * Reference: Airflow XCom `last_checkpoint {last_page, last_date}`
  * written on `APIPageFetchError` and read back on retry
  * (`airflow/dags/crime_etl.py:132-168, 190-228`;
  * `utils/custom_exceptions.py:1-6`).
  *
  * Persisted as a tiny JSON file, written atomically (temp + move) so a
  * crash mid-write can never corrupt resume state. Driver-side only —
  * checkpoint state is scalar, never a distributed dataset.
  */
final case class CheckpointState(lastDate: String, lastPage: Int)

class Checkpoint(path: String) {

  def read(): Option[CheckpointState] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) None
    else {
      val s = Files.readString(p)
      val date = "\"last_date\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(s).map(_.group(1))
      val page = "\"last_page\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(s).map(_.group(1).toInt)
      for (d <- date; g <- page) yield CheckpointState(d, g)
    }
  }

  def write(state: CheckpointState): Unit = {
    val tmp = Paths.get(path + ".tmp")
    Files.createDirectories(tmp.toAbsolutePath.getParent)
    Files.writeString(tmp, s"""{"last_date": "${state.lastDate}", "last_page": ${state.lastPage}}""")
    Files.move(tmp, Paths.get(path), StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Clear state when retries are exhausted (`crime_etl.py:160-168`). */
  def clear(): Unit = Files.deleteIfExists(Paths.get(path))
}
