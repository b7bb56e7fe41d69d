package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.pipeline.{PipelineSpec, StepSpec}

/** ScalaCheck invariants for the pipeline model over random DAGs. */
class PipelinePropertySpec extends SparkSpec {

  /** Random DAG: step i may take inputs only from steps < i (acyclic by
    * construction), with random params. */
  private def dagGen(n: Int): Gen[PipelineSpec] =
    Gen.sequence[Seq[StepSpec], StepSpec]((0 until n).map { i =>
      for {
        nIn <- Gen.choose(0, math.min(3, i))
        ins <- Gen.pick(nIn, 0 until i)
        p <- Gen.choose(0, 99)
      } yield StepSpec(s"s$i", "identity",
        ins.zipWithIndex.map { case (d, j) => s"in$j" -> s"s$d" }.toMap,
        Map("p" -> p.toString))
    }).map(PipelineSpec(_))

  private def sample(n: Int, seed: Long): PipelineSpec =
    dagGen(n).apply(Gen.Parameters.default, Seed(seed)).get

  test("topoOrder: every step appears after all its inputs") {
    (1 to 20).foreach { s =>
      val spec = sample(12, s.toLong)
      val order = spec.topoOrder(spec.steps.map(_.id)).map(_.id)
      val pos = order.zipWithIndex.toMap
      spec.steps.foreach { st =>
        st.inputs.values.foreach { dep =>
          assert(pos(dep) < pos(st.id), s"seed=$s: $dep !< ${st.id}")
        }
      }
    }
  }

  test("impressionIds: stable under step declaration order") {
    (1 to 20).foreach { s =>
      val spec = sample(10, 100L + s)
      val shuffled = PipelineSpec(
        new scala.util.Random(s).shuffle(spec.steps))
      assert(spec.impressionIds == shuffled.impressionIds, s"seed=$s")
    }
  }

  test("impressionIds: changing one step's params invalidates exactly its downstream cone") {
    (1 to 20).foreach { s =>
      val spec = sample(10, 200L + s)
      val victim = spec.steps(s % spec.steps.length).id
      val changed = PipelineSpec(spec.steps.map {
        case st if st.id == victim => st.copy(params = Map("p" -> "CHANGED"))
        case st => st
      })
      // downstream cone of victim = steps that (transitively) read it
      val downstream = {
        var cone = Set(victim)
        var grew = true
        while (grew) {
          val next = cone ++ spec.steps
            .filter(_.inputs.values.exists(cone)).map(_.id)
          grew = next != cone; cone = next
        }
        cone
      }
      spec.steps.map(_.id).foreach { id =>
        val same = spec.impressionIds(id) == changed.impressionIds(id)
        assert(same != downstream.contains(id),
          s"seed=$s step=$id downstream=${downstream.contains(id)} same=$same")
      }
    }
  }
}
