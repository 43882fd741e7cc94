package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.Json

/** The stress pack's coverage rule, promoted from convention to assertion:
  * the ×N scaling pack must contain every query whose committed CLEAN bench
  * median exceeds 1.5 s. Expensive queries are exactly the ones whose
  * scaling behavior needs empirical evidence — d26's quadratic selection
  * shipped in round 8 precisely because it was expensive but outside the
  * pack, and round 9's "any >1 s query joins the pack in the same commit"
  * rule had no teeth until this spec.
  *
  * The reference record is `results/bench_clean.json` — a committed,
  * round-stable copy of the latest clean full sweep (degraded == 0) — NOT
  * `results/bench_latest.json`, which the driver overwrites every round and
  * which a degraded measurement window could contaminate with transient
  * 2 s spikes, flaking this suite on box noise rather than plan cost.
  */
class StressCoverageSpec extends AnyFunSuite {

  private val packNames = Stress.heavyPack.map(_._1).toSet

  test("round-11 additions are in the pack") {
    for (q <- Seq("d23_band_sweep", "s05_ann_recall", "r26_basket_lift",
                  "g04_component_profile"))
      assert(packNames.contains(q), s"$q missing from the stress pack")
  }

  test("pack covers every >1.5s query in the committed clean bench record") {
    val f = java.nio.file.Paths.get("results/bench_clean.json")
    assert(java.nio.file.Files.exists(f),
      "results/bench_clean.json missing — commit a clean full-sweep " +
        "artifact (degraded == 0) under that name")
    val rec = Json.parse(new String(java.nio.file.Files.readAllBytes(f),
      java.nio.charset.StandardCharsets.UTF_8))
      .asInstanceOf[Map[String, Any]]
    def num(v: Any): Double = v match {
      case l: Long => l.toDouble
      case d: Double => d
      case o => o.toString.toDouble
    }
    assert(num(rec("degraded")) == 0.0,
      "the committed clean record must have degraded == 0")
    val slow = rec("queries").asInstanceOf[Map[String, Any]]
      .collect { case (name, med) if num(med) > 1.5 => name }
    val missing = slow.filterNot(packNames.contains)
    assert(missing.isEmpty,
      s"queries over 1.5 s in the clean bench record but absent from the " +
        s"stress pack: ${missing.mkString(", ")} — add them to " +
        "Stress.heavyPack in the same commit that made them expensive")
  }
}
