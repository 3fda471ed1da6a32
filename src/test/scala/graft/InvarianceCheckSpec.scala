package graft.tools

import org.scalatest.funsuite.AnyFunSuite

import InvarianceCheck.parseCfg

/** Config-arg parsing for the invariance A/B harness — notably the `\,`
  * escape (r12 verdict #6): a list-valued Spark conf was previously
  * documented as inexpressible because config args split on every comma.
  */
class InvarianceCheckSpec extends AnyFunSuite {

  test("plain cpus,shuffle and the aqe component parse as before") {
    assert(parseCfg("32,32") == ((32, 32, true, Seq.empty)))
    assert(parseCfg("5,7,false") == ((5, 7, false, Seq.empty)))
    assert(parseCfg("5,7,true,graft.lpa.broadcastBudgetBytes=0") ==
      ((5, 7, true, Seq("graft.lpa.broadcastBudgetBytes" -> "0"))))
    // key=val in position 3 without an aqe component: aqe defaults on
    assert(parseCfg("5,7,a.b=c") == ((5, 7, true, Seq("a.b" -> "c"))))
  }

  test("\\, escapes a literal comma inside a conf value") {
    assert(parseCfg("""5,7,true,spark.foo=a\,b\,c""") ==
      ((5, 7, true, Seq("spark.foo" -> "a,b,c"))))
    // escaped and unescaped mixed: the unescaped comma still splits
    assert(parseCfg("""5,7,true,x=1\,2,y=3""") ==
      ((5, 7, true, Seq("x" -> "1,2", "y" -> "3"))))
  }
}
