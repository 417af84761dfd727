"""CPC compression characterization tables — published DATA extracted
programmatically from the reference (cpc/compression_data.rs; extraction
script inline in session history, same policy as cpc_tables.py).

Only the ENCODING side is stored: the reference's decoding tables
(12-bit-peek -> (length << 8) | symbol) are canonical-prefix expansions of
the encoding entries ((length << 12) | codeword) and are regenerated at
import — the extraction script verified bit-equality against the
reference's committed decode tables for all 22 byte tables and the
65-symbol unary table, and that COLUMN_PERMUTATIONS_FOR_DECODING is the
exact inverse of ..._FOR_ENCODING (so only the forward permutation is
stored).
"""

import base64

import numpy as np


def _u16(s, shape):
    return np.frombuffer(base64.b64decode(s), dtype="<u2").reshape(shape).copy()


def _u8(s, shape):
    return np.frombuffer(base64.b64decode(s), dtype=np.uint8).reshape(shape).copy()


LENGTH_LIMITED_UNARY_ENCODING_TABLE65 = _u16(
    "ABABIAMwB0APUB9wX4DfgD+gP6I/sT/FP80/wz/LP8c/z7/Av8i/xL/Mv8K/yr/Gv86/wb/Jv8W/"
    "zb/Dv8u/x7/Pf8B/yH/Ef8x/wn/Kf8Z/zn/Bf8l/xX/Nf8N/y3/Hf8//wP/I/8T/zP/C/8r/xv/O"
    "/8H/yf/F/83/w//L/8f/zw==", 65)

COLUMN_PERMUTATIONS_FOR_ENCODING = _u8(
    "AAECAwUGBwgJCgsMDQ8QERITFBUWFxgZGhscHR4fICEjJCUmJygpKissLS4vMDEyMzQ1NjciDgQA"
    "AQIDBQYHCAkKCwwNDhAREhMUFRYXGBkaGxwdHh8gISIkJSYnKCkqKywtLi8wMTIzNDU2NyMPBAAB"
    "AgMEBgcICQoLDA0ODxESExQVFhcYGRobHB0eHyAhIiMkJicoKSorLC0uLzAxMjM0NTY3JRAFAAEC"
    "AwQGBwgJCgsMDQ4PEBITFBUWFxgZGhscHR4fICEiIyQlJigpKissLS4vMDEyMzQ1NjcnEQUAAQID"
    "BAUHCAkKCwwNDg8QERMUFRYXGBkaGxwdHh8gISIjJCUmJygqKywtLi8wMTIzNDU2NykSBgABAgME"
    "BQcICQoLDA0ODxAREhQVFhcYGRobHB0eHyAhIiMkJSYnKCkqLC0uLzAxMjM0NTY3KxMGAQIDBAUG"
    "CAkKCwwNDg8QERITFRYXGBkaGxwdHh8gISIjJCUmJygpKissLi8wMTIzNDU2Ny0UBwABAgMEBQYI"
    "CQoLDA0ODxAREhMUFhcYGRobHB0eHyAhIiMkJSYnKCkqKywtLjAxMjM0NTY3LxUHAAECAwQFBgcJ"
    "CgsMDQ4PEBESExQVFxgZGhscHR4fICEiIyQlJicoKSorLC0uLzAxMzQ1NjcyFggAAAIDBAUGBwgK"
    "CwwNDg8QERITFBUWGBkaGxwdHh8gISIjJCUmJygpKissLS4vMDEyMzU2NzQXCQEAAgMEBQYHCAoL"
    "DA0ODxAREhMUFRYXGBobHB0eHyAhIiMkJSYnKCkqKywtLi8wMTIzNDU2NxkJAQACAwQFBgcICQsM"
    "DQ4PEBESExQVFhcYGRscHR4fICEiIyQlJicoKSorLC0uLzAxMjM0NTY3GgoBAAEDBAUGBwgJCgwN"
    "Dg8QERITFBUWFxgZGhwdHh8gISIjJCUmJygpKissLS4vMDEyMzQ1NjcbCwIAAQMEBQYHCAkKDA0O"
    "DxAREhMUFRYXGBkaGxweHyAhIiMkJSYnKCkqKywtLi8wMTIzNDU2Nx0LAgABAgQFBgcICQoLDQ4P"
    "EBESExQVFhcYGRobHB0fICEiIyQlJicoKSorLC0uLzAxMjM0NTY3HgwDAAECBAUGBwgJCgsMDg8Q"
    "ERITFBUWFxgZGhscHR4fISIjJCUmJygpKissLS4vMDEyMzQ1NjcgDQM=", (16, 56))

ENCODING_TABLES_FOR_HIGH_ENTROPY_BYTE = _u16(
    "F5AJUDNwAjAXkRlQc3AAIHehHWA7gAFAd6MFULuABjDPsAtw96AVUM+0S3CXkA1Qr8R7gPeiPWCv"
    "zPuA96EDYK/CB4DPsiNgr8qHgPejE2CvxpeRr84rcK/BV5DPtmtwr8kPoK/FR4CvzQ+ir8PHgK/L"
    "z7Gvx1eRr8/PtW/A15BvyNeRb8QbcG/MN5DPs1twb8IPoW/KJ4Bvxg+jb86ngG/Bz7dvyTeRb8Uv"
    "sG/Nt5Bvw2/Lb8ePoG/P78DvyI+i78TvzO/Cj6Hvyu/G786Po+/B78nvxS+0783vw+/LL7Lvx+/P"
    "H8AfyB/EH8wfwh/KH8Yfzh/BH8kfxR/NH8Mfyx/HT6Afz2eAn8BPop/I54CfxC+2n8y3kZ/CL7Gf"
    "yneQn8afzp/BT6GfyZ/Fn81Po5/Dn8ufxy+1n89fwF/IL7NfxF/MX8Ivt1/KX8Zfzq+wX8FfyV/F"
    "X81fw1/LX8dfz9/A38jfxN/M38Lfyt/G387fwd/J38Xfzd/D38vfx9/PP8A/yD/EP8w/wj/KP8Y/"
    "zj/BP8k/xT/NP8M/yz/HP8+/wL/Iv8S/zL/Cv8q/xr/Ov8G/yb/Fv82/w7/Lv8e/z3/Af8h/xH/M"
    "f8J/yn/Gf85/wX/Jf8V/zX/Df8t/x3/P/8D/yP/E/8z/wv/K/8b/zv/B/8n/xf/N/8P/y//H/893"
    "oQlQO4ACMBeQGVALcAAgT7MdYBeRAUB3oz1gu4AGMK/ES3D3oAVQT7crcJeQFVCvzHuAz7ADYK/C"
    "+4D3og1Qr8oHgM+0I2CvxoeA96ETYK/Ol5GvwWtwr8lXkM+yM2Cvxfejr81HgK/DD6Cvy8eAr8fP"
    "tq/PV5FvwM+xb8jXkG/E15FvzBtwb8I3kM+1W3Bvyg+ib8YngG/OD6FvwaeAb8nPs2/FN5Fvzc+3"
    "b8O3kG/Lb8dvzw+j78DvyO/Ej6DvzO/C78qPou/G787vwY+h78nvxe/NL7Dvw+/L78cvtO/PH8Af"
    "yB/EH8wfwh/KH8Yfzh/BH8kfxR/NH8Mfyx/HH8+Po5/AZ4CfyE+gn8TngJ/ML7KfwreRn8ovtp/G"
    "d5Cfzp/Bn8lPop/Fn82fw0+hn8ufx5/PL7FfwF/IX8QvtV/MX8Jfyi+zX8Zfzl/BL7dfyV/FX81f"
    "w1/LX8dfz6+w38DfyN/E38zfwt/K38bfzt/B38nfxd/N38Pfy9/H388/wD/IP8Q/zD/CP8o/xj/O"
    "P8E/yT/FP80/wz/LP8c/z7/Av8i/xL/Mv8K/yr/Gv86/wb/Jv8W/zb/Dv8u/x7/Pf8B/yH/Ef8x/"
    "wn/Kf8Z/zn/Bf8l/xX/Nf8N/y3/Hf8//wP/I/8T/zP/C/8r/xv/O/8H/yf/F/83/w//L/8f/z3eh"
    "CVA7gAIwd6MZULuAACBPsx1gV5ABQE+3PWB7gAYwL8cLcPegBVAvz0tw96IVUK/A+4DPsANgr8gH"
    "gPehDVCvxIeAz7QjYK/MR4DPshNgr8JXka/KK3CvxteQr84zYK/B96OvyceAr8UPoK/NJ4Cvw8+2"
    "r8vXka/Hz7Gvz6eAb8A3kG/Ia3BvxDeRb8wbcG/CD6JvymeAb8YPoW/OW3Bvwc+1b8m3kG/Fz7Nv"
    "zbeRb8Nvy2/HD6Nvz+/A78iPoO/E78zvwo+i78rvxu/Oj6Hvwe/J78XPt+/N78Pvyy+w78fvzx/A"
    "H8gfxB/MH8Ifyh/GH84fwR/JH8UfzR/DH8sfx4+jH8/ngJ/AT6CfyBeAn8QvtJ/Md5Cfwi+yn8qX"
    "gJ/Gn86fwU+in8mfxZ/NT6Gfw5/Ln8cvtp/PX8BfyC+xX8RfzF/CL7Vfyl/GX84vs1/BX8lfxV/N"
    "X8Nfy1/HX8/fwN/I38TfzN/C38rfxt/O38Hfyd/F383fw9/L38ffzz/AP8g/xD/MP8I/yj/GP84/"
    "wT/JP8U/zT/DP8s/xz/Pv8C/yL/Ev8y/wr/Kv8a/zr/Bv8m/xb/Nv8O/y7/Hv89/wH/If8R/zH/C"
    "f8p/xn/Of8F/yX/Ff81/w3/Lf8d/z//A/8j/xP/M/8L/yv/G/87/wf/J/8X/zf/D/8v/x//PT7Id"
    "YJeQAjD3oQVQe4AAIC/FPWCXkQFAT7YDYFeQBjAvzfuAT7EVUC/DK3D3owlAL8sHgE+1I2Avx4eA"
    "T7MNUC/PV5GvwBNgr8hHgE+3M2CvxNeQr8xrcK/C15Gvygtgr8bPsK/Ox4CvwQ+gr8kngK/Fz7Sv"
    "zTeQr8PPsq/Lp4Cvxw+ir88bcG/AN5FvyFtwb8TPtm/MZ4Bvwg+hb8o7cG/Gb85vwbeQb8nPsW/F"
    "t5FvzW/Db8sPo2/Hb8/vwHeQ78jvxO/Mj6Dvwu/K78aPou/O78Hvyc+178Xvze/Dz7Pvy+/H788f"
    "wB/IH8QfzB/CH8ofxh/OH8EfyR/FH80fwx/Lz7cfx+eAH8+PoZ/AF4CfyJ/En8x3kZ/CL7CfyveQ"
    "n8afzp/Bj6OfyZ/Fn81PoJ/Dn8ufxy+0n89fwF/IL7JfxF/MX8Ivtl/KX8Zfzi+xX8FfyV/FX81f"
    "w1/LX8dfz9/A38jfxN/M38Lfyt/G387fwd/J38Xfzd/D38vfx9/PP8A/yD/EP8w/wj/KP8Y/zj/B"
    "P8k/xT/NP8M/yz/HP8+/wL/Iv8S/zL/Cv8q/xr/Ov8G/yb/Fv82/w7/Lv8e/z3/Af8h/xH/Mf8J/"
    "yn/Gf85/wX/Jf8V/zX/Df8t/x3/P/8D/yP/E/8z/wv/K/8b/zv/B/8n/xf/N/8P/y//H/89Psh1g"
    "V5ACME+2BVB7gAAgL8MLcPegAUBPsT1gV5EGMC/L+4BPtRVQL8dLcPeiCUAvzweAT7MDYK/Ah4BP"
    "tw1Qr8jXkK/EI2CvzEeAz7ATYK/C96Gvyitwr8bXka/OM2Cvwc+0r8nHgK/F96OvzWtwr8PPsq/L"
    "N5Cvx8+2r88ngG/AD6BvyBtwb8Q3kW/MW3Bvws+xb8qngG/GD6Jvzjtwb8FvyW/Ft5Bvzc+1b8Nn"
    "gG/Lb8dvzw+h78DvyO/Et5HvzO/C78oPo+/G787vwY+g78nvxe/Nz7Pvw+/L78ePou/PH8AfyB/E"
    "H8wfwh/Kz7cfxh/OH8EfyR/FH80fwx/LH8cvsB/P54CfwI+hn8gXgJ/En8yfwneQn8ovtJ/Gl4Cf"
    "zp/Bn8mPo5/Fn82fw3eRn8ufx5/PL7JfwF/IX8RPoF/MX8Jfyi+2X8Zfzl/BL7FfyV/FX81fw1/L"
    "X8dfzy+138DfyN/E38zfwt/K38bfzt/B38nfxd/N38Pfy9/H388/wD/IP8Q/zD/CP8o/xj/OP8E/"
    "yT/FP80/wz/LP8c/z7/Av8i/xL/Mv8K/yr/Gv86/wb/Jv8W/zb/Dv8u/x7/Pf8B/yH/Ef8x/wn/K"
    "f8Z/zn/Bf8l/xX/Nf8N/y3/Hf8//wP/I/8T/zP/C/8r/xv/O/8H/yf/F/83/w//L/8f/zy/BHWBX"
    "kAIwT7EFUHuAACAvyQtw96EBQC/FPWBXkQYwL837gE+1FVAvw0tw96MJQC/LB4AvxwNgL8+HgE+z"
    "DVCvwNeQr8gjYK/ER4BPtxNgr8wPoK/CK3CvyteRr8YzYK/Oz7CvwceAr8kPoq/Fa3Cvza/Dr8s3"
    "kK/Hz7SvzyeAb8APoW/IG3BvxDeRb8xbcG/Cz7JvyqeAb8YPo2/OO3BvwW/Jb8W3kG/Nz7Zvw2eA"
    "b8tvx2/Pj6DvwO/I78S3ke/M78Lvyo+i78bvzu/Bd5Dvye/F783Pse/D78vvx4+h788fwB/IH8Qf"
    "zB/CH8rPtR/GH84fwR/JH8UfzR/DH8sfx8+zH8/ngJ/Aj6OfyBeAn8SfzJ/Cd5Gfys+3n8aXgJ/O"
    "n8GfyU+gn8WfzZ/D95Cfy5/Hn88vsF/AX8hfxE+iX8xfwl/KL7Rfxl/OX8Evsl/JX8VfzV/DX8tf"
    "x1/PL7bfwN/I38TfzN/C38rfxt/O38Hfyd/F383fw9/L38ffzz/AP8g/xD/MP8I/yj/GP84/wT/J"
    "P8U/zT/DP8s/xz/Pv8C/yL/Ev8y/wr/Kv8a/zr/Bv8m/xb/Nv8O/y7/Hv89/wH/If8R/zH/Cf8p/"
    "xn/Of8F/yX/Ff81/w3/Lf8d/z//A/8j/xP/M/8L/yv/G/87/wf/J/8X/zf/D/8v/x//PHWACMD1g"
    "ACALcAFAA2AGMHuABVBLcAlAl5AjYPuAFVCXkRNgB4ANUPegK3BXkDNgT7GHgPeia3BPtVeR96FH"
    "gPejG3DXkFtwT7PHgA+gO3Avw9eRT7cngC/LD6LPsDeQL8cPoS/PN5GvwM+0r8gPo6/Er8yvws+y"
    "r8qvxq/Oz7bPsaeAj6BngK/Bt5DPteeAr8mPoq/Ft5Gvzc+zr8OPoa/Lz7evx4+jr89vwG/IL7Bv"
    "xG/Mb8Jvym/Gb85vwW/Jb8VvzW/DL7Rvy2/Hb8/vwO/I78TvzO/C78rvxu/O78Hvye/F783vw+/L"
    "78fvzx/AH8gfxB/MH8Ifyh/GH84fwR/Jd5AvsheAH8VPoB/Nd5Efwy+2H8tPoh/HH8+fwC+xn8if"
    "xJ/ML7Wfwp/Kn8afzp/Bn8mfxZ/Nn8Ofy5/Hn89fwF/IX8RfzF/CX8pfxl/OX8FfyV/FX81fw1/L"
    "X8dfz9/A38jfxN/M38Lfyt/G387fwd/J38Xfzd/D38vfx9/PP8A/yD/EP8w/wj/KP8Y/zj/BP8k/"
    "xT/NP8M/yz/HP8+/wL/Iv8S/zL/Cv8q/xr/Ov8G/yb/Fv82/w7/Lv8e/z3/Af8h/xH/Mf8J/yn/G"
    "f85/wX/Jf8V/zX/Df8t/x3/P/8D/yP/E/8z/wv/K/8b/zv/B/8n/xf/N/8P/y//H/88LcAIwHWAA"
    "IEtwAUA9YAYwB4AFUCtwCUCXkANgh4AVUJeRI2BHgA1Q96BrcFeQE2BPsceA96IbcC/FV5FPtSeA"
    "96FbcNeQM2BPs6eA96M7cC/N15FPt2eAL8MPoC/LN5Avxw+iL883ka/Az7CvyA+hr8SvzK/Cz7Sv"
    "yq/Gr87Pss+254APo3twr8G3kM+xF4CvyY+gr8W3ka/Nz7Wvw4+ir8vPs6/Hj6Gvz2/Ab8jPt2/E"
    "b8xvwm/Kb8Zvzm/Bb8lvxW/Nb8MvsG/Lb8dvz+/A78jvxO/M78Lvyu/G787vwe/J78Xvze/D78vv"
    "x+/PH8AfyB/EH8wfwh/KH8Yfzh/BH8mPoy+0d5AfxU+gH813kR/DL7Ify0+iH8cfz5/AL7afyJ/E"
    "n8wvsZ/Cn8qfxp/On8GfyZ/Fn82fw5/Ln8efz1/AX8hfxF/MX8Jfyl/GX85fwV/JX8VfzV/DX8tf"
    "x1/P38DfyN/E38zfwt/K38bfzt/B38nfxd/N38Pfy9/H388/wD/IP8Q/zD/CP8o/xj/OP8E/yT/F"
    "P80/wz/LP8c/z7/Av8i/xL/Mv8K/yr/Gv86/wb/Jv8W/zb/Dv8u/x7/Pf8B/yH/Ef8x/wn/Kf8Z/"
    "zn/Bf8l/xX/Nf8N/y3/Hf8//wP/I/8T/zP/C/8r/xv/O/8H/yf/F/83/w//L/8f/zzNwBkAdYAAg"
    "c3AOQD1gAjB7gAVQC3ABQJeQFVD7gAlA96ADYAeADVD3oktwl5EjYE+zh4D3oStwT7dHgPeja3DP"
    "sBtwV5ATYM+0x4APoFtwL8dXkc+yJ4Avz9eQz7angK/AD6KvyNeRr8QPoa/MN5Cvwq/Kr8bPsa/O"
    "r8Gvyc+1r8VngA+jO3CvzTeRz7PngK/Dj6Cvy7eQr8ePoq/Pt5FvwM+3b8iPoW/EL7BvzI+jb8Jv"
    "ym/Gb85vwW/Jb8VvzW/Db8tvxy+0b8/vwO/IL7LvxO/M78Lvyu/G787vwe/J78Xvze/D78vvx+/P"
    "H8AfyB/EH8wfwh/KH8Yfzh/BH8kfxXeQH80XgB/DT6Afy3eRH8cvth/PT6KfwC+xn8hPoZ/En8yf"
    "wi+1n8qfxp/OL7OfwZ/Jn8WfzZ/Dn8ufx5/PX8BfyF/EX8xfwl/KX8Zfzl/BX8lfxV/NX8Nfy1/H"
    "X8/fwN/I38TfzN/C38rfxt/O38Hfyd/F383fw9/L38ffzz/AP8g/xD/MP8I/yj/GP84/wT/JP8U/"
    "zT/DP8s/xz/Pv8C/yL/Ev8y/wr/Kv8a/zr/Bv8m/xb/Nv8O/y7/Hv89/wH/If8R/zH/Cf8p/xn/O"
    "f8F/yX/Ff81/w3/Lf8d/z//A/8j/xP/M/8L/yv/G/87/wf/J/8X/zf/D/8v/x//PM3AGQB1gACBz"
    "cA5APWACMJeQBVALcAFAl5EDYHuACUD3oCNg+4AVUPeiS3BXkA1QT7MHgPehK3Avx4eA96NrcE+3"
    "G3BXkRNgz7BHgA+gW3Avz9eQz7THgK/A15HPsieAr8gPoq/EN5CvzA+hr8I3ka/Kr8avzg+jr8Gv"
    "ya/Fz7avzaeAz7E7cK/Dt5DPtWeAr8uPoK/Ht5Gvz4+ib8B3kG/Iz7NvxI+hb8zPt2/Cj6Nvym/G"
    "b84vsG/Bb8lvxW/Nb8Nvy2/HL7Rvz+/A78gvsu/E78zvwu/K78bvzu/B78nvxe/N78Pvy+/H788f"
    "wB/IH8QfzB/CH8ofxh/OH8EfyR/Fd5EfzeeAH8NPoB/LF4Afxy+2H89Pop/AL7GfyE+hn8SfzJ/C"
    "L7Wfyp/Gn84vs5/Bn8mfxZ/Nn8Ofy5/Hn89fwF/IX8RfzF/CX8pfxl/OX8FfyV/FX81fw1/LX8df"
    "z9/A38jfxN/M38Lfyt/G387fwd/J38Xfzd/D38vfx9/PP8A/yD/EP8w/wj/KP8Y/zj/BP8k/xT/N"
    "P8M/yz/HP8+/wL/Iv8S/zL/Cv8q/xr/Ov8G/yb/Fv82/w7/Lv8e/z3/Af8h/xH/Mf8J/yn/Gf85/"
    "wX/Jf8V/zX/Df8t/x3/P/8D/yP/E/8z/wv/K/8b/zv/B/8n/xf/N/8P/y//H/88LcAZAHWAAIHuA"
    "DkA9YAIwF5AFUEtwAUAXkQNg+4AJQHehI2CXkBVQd6MrcJeRDVBPsweA96BrcK/Ah4D3ohtwT7dH"
    "gPehE2DPsMeA96MzYK/IV5DPtCeAr8RXkc+yp4CvzA+gr8LXkK/KD6KvxteRr87Ptq/BD6Gvya/F"
    "r80Po6/DN5DPsVtwr8s3kc+1O3Cvx4+gr8+3kG/Aj6JvyLeRb8TPs2/Mj6Fvws+3b8qPo2/Gb85v"
    "wS+wb8lvxW/NL7Rvw2/Lb8cvsm/P78DvyC+278TvzO/C78rvxu/O78Hvye/F783vw+/L78fvzx/A"
    "H8gfxB/MH8Ifyh/GH84fwR/JH8V3kB/NZ4Afw0+gH8vngB/HL7Efz0+in8AvtZ/IT6GfxJ/Mn8Iv"
    "s5/Kn8afzi+3n8GfyZ/Fn82fw5/Ln8efz1/AX8hfxF/MX8Jfyl/GX85fwV/JX8VfzV/DX8tfx1/P"
    "38DfyN/E38zfwt/K38bfzt/B38nfxd/N38Pfy9/H388/wD/IP8Q/zD/CP8o/xj/OP8E/yT/FP80/"
    "wz/LP8c/z7/Av8i/xL/Mv8K/yr/Gv86/wb/Jv8W/zb/Dv8u/x7/Pf8B/yH/Ef8x/wn/Kf8Z/zn/B"
    "f8l/xX/Nf8N/y3/Hf8//wP/I/8T/zP/C/8r/xv/O/8H/yf/F/83/w//L/8f/zzuABkAdYAAgu4AO"
    "QD1gAjAXkAVQe4ABQBeRA2D7gAlAd6EjYJeQFVB3oytwl5ENUE+zB4D3oBNgr8CHgPeia3BPt0eA"
    "96EzYM+wx4D3owtgr8hXkM+0J4CvxFeRz7KngK/MD6CvwteQr8oPoq/G15Gvzs+2r8EPoa/Jr8Wv"
    "zQ+jr8M3kM+xG3CvyzeRz7VbcK/Hj6Cvz7eQb8CPom/It5FvxM+zb8yPoW/Cz7dvyo+jb8Zvzm/B"
    "L7BvyW/Fb80vtG/Db8tvxy+yb8/vwO/IL7bvxO/M78Lvyu/G787vwe/J78Xvze/D78vvx+/PH8Af"
    "yB/EH8wfwh/KH8Yfzh/BH8kfxU+gH81ngB/DT6Ify+eAH8cvsR/Pd5CfwC+1n8hPoZ/En8yfwi+z"
    "n8qfxp/OL7efwZ/Jn8WfzZ/Dn8ufx5/PX8BfyF/EX8xfwl/KX8Zfzl/BX8lfxV/NX8Nfy1/HX8/f"
    "wN/I38TfzN/C38rfxt/O38Hfyd/F383fw9/L38ffzz/AP8g/xD/MP8I/yj/GP84/wT/JP8U/zT/D"
    "P8s/xz/Pv8C/yL/Ev8y/wr/Kv8a/zr/Bv8m/xb/Nv8O/y7/Hv89/wH/If8R/zH/Cf8p/xn/Of8F/"
    "yX/Ff81/w3/Lf8d/z//A/8j/xP/M/8L/yv/G/87/wf/J/8X/zf/D/8v/x//Pe4AGQB1gACD7gA5A"
    "C3ACMJeQBVAHgAFAl5E9YIeACUB3oUtwV5AVUE+zK3BXkQ1QL8dHgHejA2Avz8eA96AjYK/AJ4D3"
    "ohNgr8ingPehM2CvxNeQT7drcK/M15HPsBtwr8L3o6/KN5Cvxg+gr843ka/Bz7SvyQ+ir8XPsq/N"
    "D6Gvw7eQz7ZbcK/Lt5HPsTtwr8cPo6/PZ4BvwI+gb8h3kG/Ez7VvzI+ib8LPs2/Kj6Fvxm/Ob8HP"
    "t2/Jb8VvzS+wb8Nvy2/HL7Rvz+/A78gvsu/E78zvwu/K78bvzu/B78nvxe/N78Pvy+/H788fwB/I"
    "H8QfzB/CH8ofxh/OH8EfyR/Fj6MfzeeAH8NPoB/LF4Afxy+2H89Pop/AL7GfyE+hn8SfzJ/CL7Wf"
    "yp/Gn84vs5/Bn8mfxZ/Nn8Ofy5/Hn89fwF/IX8RfzF/CX8pfxl/OX8FfyV/FX81fw1/LX8dfz9/A"
    "38jfxN/M38Lfyt/G387fwd/J38Xfzd/D38vfx9/PP8A/yD/EP8w/wj/KP8Y/zj/BP8k/xT/NP8M/"
    "yz/HP8+/wL/Iv8S/zL/Cv8q/xr/Ov8G/yb/Fv82/w7/Lv8e/z3/Af8h/xH/Mf8J/yn/Gf85/wX/J"
    "f8V/zX/Df8t/x3/P/8D/yP/E/8z/wv/K/8b/zv/B/8n/xf/N/8P/y//H/887gAZAM3ACMLuADkBz"
    "cAAg96AdYHuAAUD3ogVQ+4AJQE+zC3BXkBVQT7dLcFeRDVAvxweA96E9YC/Ph4D3owNgr8BHgA+g"
    "I2CvyMeAD6ITYK/E15DPsCtwr8zXkc+0a3Cvwg+hr8ongK/GD6OvzqeAr8HPsq/Jj6Cvxc+2r82P"
    "oq/DN5DPsRtwr8s3kc+1W3Cvx4+hr89ngG/Aj6NvyOeAb8TPs2/Mt5Bvws+3b8q3kW/Gb85vwS+w"
    "b8lvxW/NL7Rvw2/Lb8cvsm/P78DvyC+278TvzO/C78rvxu/O78Hvye/F783vw+/L78fvzx/AH8gf"
    "xB/MH8Ifyh/GH84fwR/JH8VPoB/NF4Afw0+iH8uXgB/HL7Efz3eQn8AvtZ/Id5GfxJ/Mn8Ivs5/K"
    "n8afzk+hn8GfyZ/Fn82fw5/Ln8efz1/AX8hfxF/MX8Jfyl/GX85fwV/JX8VfzV/DX8tfx1/P38Df"
    "yN/E38zfwt/K38bfzt/B38nfxd/N38Pfy9/H388/wD/IP8Q/zD/CP8o/xj/OP8E/yT/FP80/wz/L"
    "P8c/z7/Av8i/xL/Mv8K/yr/Gv86/wb/Jv8W/zb/Dv8u/x7/Pf8B/yH/Ef8x/wn/Kf8Z/zn/Bf8l/"
    "xX/Nf8N/y3/Hf8//wP/I/8T/zP/C/8r/xv/O/8H/yf/F/83/w//L/8f/zxeQBkAzcAIwF5EOQHNw"
    "ACB3oR1gO4ABQHejBVC7gAlAz7ALcJeQFVDPtEtwl5ENUK/Ee4D3oD1gr8z7gPeiA2CvwgeA96Ej"
    "YK/Kh4D3oxNgr8ZXkM+yK3CvzleRz7ZrcK/BD6CvyUeAr8UPoq/Nx4Cvw8+xr8sPoa/Hz7Wvz9eQ"
    "b8DXkc+zG3BvyDeQz7dbcG/ED6NvzCeAb8KPoG/Kp4Bvxi+wb843kW/BL7RvybeQb8VvzW/DL7Jv"
    "y2/Hb8+Pou/A78jvxI+h78zvwu/Kj6Pvxu/O78Hvye/F783vwy+278vvx+/PH8AfyB/EH8wfwh/K"
    "H8Yfzh/BH8kfxR/NH8Mfy0+gH8dngB/PT6KfwOeAn8gvsZ/Et5GfzC+1n8J3kJ/Kn8afzk+hn8Gf"
    "yZ/FT6OfzZ/Dn8ufx5/PX8BfyC+zX8RfzF/CL7dfyl/GX86vsF/BX8lfxV/NX8Nfy1/HX8/fwN/I"
    "38TfzN/C38rfxt/O38Hfyd/F383fw9/L38ffzz/AP8g/xD/MP8I/yj/GP84/wT/JP8U/zT/DP8s/"
    "xz/Pv8C/yL/Ev8y/wr/Kv8a/zr/Bv8m/xb/Nv8O/y7/Hv89/wH/If8R/zH/Cf8p/xn/Of8F/yX/F"
    "f81/w3/Lf8d/z//A/8j/xP/M/8L/yv/G/87/wf/J/8X/zf/D/8v/x//PF5AGQDNwAjAXkQ5Ac3AA"
    "IPegHWA7gAFA96IFULuACUDPsAtwl5AVUM+0S3CXkQ1Qr8B7gM+yPWCvyPuA96EDYK/EB4DPtiNg"
    "r8yHgPejE2CvwleQr8orcK/GV5HPsWtwr84PoK/BR4CvyQ+ir8XHgK/Nz7Wvw9eQr8vPs6/H15Gv"
    "zzeQb8AbcG/IN5HPt1twb8QPoW/MJ4Bvwg+jb8qngG/GL7BvzreQb8EvtG/Jt5FvxW/Nb8OPoG/L"
    "b8dvz4+i78DvyO/Ej6HvzO/C78qPo+/G787vwe/J78Xvze/DL7Lvy+/H788fwB/IH8QfzB/CH8of"
    "xh/OH8EfyR/FH80fwx/LT6Afx2eAH89Pop/A54CfyC+2n8R3kJ/ML7GfwneRn8qfxp/OT6GfwZ/J"
    "n8VPo5/Nn8Ofy5/Hn89fwF/IL7VfxF/MX8Ivs1/KX8Zfzi+3X8FfyV/FX81fw1/LX8dfz9/A38jf"
    "xN/M38Lfyt/G387fwd/J38Xfzd/D38vfx9/PP8A/yD/EP8w/wj/KP8Y/zj/BP8k/xT/NP8M/yz/H"
    "P8+/wL/Iv8S/zL/Cv8q/xr/Ov8G/yb/Fv82/w7/Lv8e/z3/Af8h/xH/Mf8J/yn/Gf85/wX/Jf8V/"
    "zX/Df8t/x3/P/8D/yP/E/8z/wv/K/8b/zv/B/8n/xf/N/8P/y//H/88AEAEgA0ALUBtQB2BXgHeQ"
    "J2DXgHeR96H3o4+wj8WPzRdwN4APoI+0j7KPw4/Lj8ePz0/AT8hPxE/MT8JPyk/Gt4APoo+2T85P"
    "wU/JT8VPzU/DT8tPx0/Pz8DPyM/Ez8zPws/Kz8bPzs/Bz8nPxc/Nz8PPy8/Hz88vwC/IL8QvzPeQ"
    "D6Evwi/KL8Yvzi/BL8kvxS/NL8Mvyy/HL8+vwK/Ir8SvzK/Cr8qvxq/Or8Gvya/Fr82vw6/Lr8ev"
    "z2/Ab8hvxG/Mb8Jvym/Gb85vwW/Jb8VvzW/Db8tvx2/P78DvyO/E78zvwu/K78bvzu/B78nvxe/N"
    "78Pvy+/H788fwB/ID6OPsR/EH8wfwh/KH8Yfzh/BH8kfxR/NH8Mfyx/HH8+fwJ/In8SfzJ/Cn8qf"
    "xp/On8GfyZ/Fn82fw5/Ln8efz1/AX8hfxF/MX8Jfyl/GX85fwV/JX8VfzV/DX8tfx1/P38DfyN/E"
    "38zfwt/K38bfzt/B38nfxd/N38Pfy9/H388/wD/IP8Q/zD/CP8o/xj/OP8E/yT/FP80/wz/LP8c/"
    "z7/Av8i/xL/Mv8K/yr/Gv86/wb/Jv8W/zb/Dv8u/x7/Pf8B/yH/Ef8x/wn/Kf8Z/zn/Bf8l/xX/N"
    "f8N/y3/Hf8//wP/I/8T/zP/C/8r/xv/O/8H/yf/F/83/w//L/8f/zwAgAiABMAVADUADUAtgK2AT"
    "UBtgB3BHcBeAt5D3ofejO2AncJeAV4C3kQ+gj7GPtQ+ij7NPxU/NT8NPy0/HT89ncNeAd5APoQ+j"
    "j7fPwM/IT7DPxM/Mz8LPys/Gz87Pwc/Jz8XPzc/Dz8vPx8/PL8AvyC/EL8wvwi/KL8Yvzi/BN4B3"
    "kY+gT7RPsi/JL8UvzS/DL8svxy/Pr8CvyK/Er8yvwq/Kr8avzq/Br8mvxa/Nr8Ovy6/Hr89vwG/I"
    "b8RvzG/Cb8pvxm/Ob8FvyW/Fb81vw2/Lb8dvz+/A78jvxO/M78Lvyu/G787vwe/J78Xvze/D78vv"
    "x+/PH8AfyB/EH8z3kI+iT7ZPsR/CH8ofxh/OH8EfyR/FH80fwx/LH8cfz5/An8ifxJ/Mn8Kfyp/G"
    "n86fwZ/Jn8WfzZ/Dn8ufx5/PX8BfyF/EX8xfwl/KX8Zfzl/BX8lfxV/NX8Nfy1/HX8/fwN/I38Tf"
    "zN/C38rfxt/O38Hfyd/F383fw9/L38ffzz/AP8g/xD/MP8I/yj/GP84/wT/JP8U/zT/DP8s/xz/P"
    "v8C/yL/Ev8y/wr/Kv8a/zr/Bv8m/xb/Nv8O/y7/Hv89/wH/If8R/zH/Cf8p/xn/Of8F/yX/Ff81/"
    "w3/Lf8d/z//A/8j/xP/M/8L/yv/G/87/wf/J/8X/zf/D/8v/x//PACACIAVAATADUA1AC2ArYBtg"
    "E1A7cHtwZ4DngNeQ15EHcEdwF4CXgDeQN5H3ofejD6APoo+zj7fPwM/Iz8TPzFeAJ3C3kLeRD6EP"
    "o0+wT7RPsk+2z8LPys/Gz87Pwc/Jz8XPzc/Dz8vPx8/PL8AvyC/EL8wvwi/KL8Yvzi/BL8l3kHeR"
    "j6CPok+xT7UvxS/NL8Mvyy/HL8+vwK/Ir8SvzK/Cr8qvxq/Or8Gvya/Fr82vw6/Lr8evz2/Ab8hv"
    "xG/Mb8Jvym/Gb85vwW/Jb8VvzW/Db8tvx2/P78DvyO/E78zvwu/K78bvzu/B78nvxe/N78Pvy+/H"
    "788fwB/IH8QfzI+h95BPs0+3H8Ifyh/GH84fwR/JH8UfzR/DH8sfxx/Pn8CfyJ/En8yfwp/Kn8af"
    "zp/Bn8mfxZ/Nn8Ofy5/Hn89fwF/IX8RfzF/CX8pfxl/OX8FfyV/FX81fw1/LX8dfz9/A38jfxN/M"
    "38Lfyt/G387fwd/J38Xfzd/D38vfx9/PP8A/yD/EP8w/wj/KP8Y/zj/BP8k/xT/NP8M/yz/HP8+/"
    "wL/Iv8S/zL/Cv8q/xr/Ov8G/yb/Fv82/w7/Lv8e/z3/Af8h/xH/Mf8J/yn/Gf85/wX/Jf8V/zX/D"
    "f8t/x3/P/8D/yP/E/8z/wv/K/8b/zv/B/8n/xf/N/8P/y//H/88CMAAgAUAGMA1QCUAdUAVAE2AD"
    "UDNgC2AngBtwp4BbcDtwK2B7cAdw15BngNeR54D3oTeQ96MPoM/FT7DPzU+0F4BHcDeRl4APoreQ"
    "D6G3kU+yD6NPtk+xz8PPy8/Hz88vwE+1L8gvxC/ML8Ivyi/GL84vwS/JL8UvzS/DL8svx3eQV4CP"
    "oHeRT7OPok+3z7Avz8+0r8CvyK/Er8yvwq/Kr8avzq/Br8mvxa/Nr8Ovy6/Hr89vwG/Ib8RvzG/C"
    "b8pvxm/Ob8FvyW/Fb81vw2/Lb8dvz+/A78jvxO/M78Lvyu/G787vwe/J78Xvze/D78vvx+/PH8Af"
    "yB/EH8wfwh/Kj6H3kM+yj6Mfxs+2H87PsR/BH8kfxR/NH8Mfyx/HH8+fwJ/In8SfzJ/Cn8qfxp/O"
    "n8GfyZ/Fn82fw5/Ln8efz1/AX8hfxF/MX8Jfyl/GX85fwV/JX8VfzV/DX8tfx1/P38DfyN/E38zf"
    "wt/K38bfzt/B38nfxd/N38Pfy9/H388/wD/IP8Q/zD/CP8o/xj/OP8E/yT/FP80/wz/LP8c/z7/A"
    "v8i/xL/Mv8K/yr/Gv86/wb/Jv8W/zb/Dv8u/x7/Pf8B/yH/Ef8x/wn/Kf8Z/zn/Bf8l/xX/Nf8N/"
    "y3/Hf8//wP/I/8T/zP/C/8r/xv/O/8H/yf/F/83/w//L/8f/zwZAACAOQAIwBVABQBVQCUADYA1Q"
    "I2AdUEeAE2DHgDNgG3ALYCeAK2DXkFtw15E7cPehp4D3o2eAT7IPoE+2D6I3kHtwN5EHcA+h54AP"
    "oxeAT7G3kE+1j6AvwE+zL8hPty/Ez7AvzM+0L8Ivyi/GL84vwS/JL8UvzS/DL8svxy/Pj6KXgI+h"
    "V4DPsreRz7Z3kK/Az7GvyM+1r8SvzK/Cr8qvxq/Or8Gvya/Fr82vw6/Lr8evz2/Ab8hvxG/Mb8Jv"
    "ym/Gb85vwW/Jb8VvzW/Db8tvx2/P78DvyO/E78zvwu/K78bvzu/B78nvxe/N78Pvy+/H788fwB/I"
    "H8QfzB/CH8rPs3eRz7f3kB/Gj6Mfzk+gH8EfyR/FH80fwx/LH8cfz5/An8ifxJ/Mn8Kfyp/Gn86f"
    "wZ/Jn8WfzZ/Dn8ufx5/PX8BfyF/EX8xfwl/KX8Zfzl/BX8lfxV/NX8Nfy1/HX8/fwN/I38TfzN/C"
    "38rfxt/O38Hfyd/F383fw9/L38ffzz/AP8g/xD/MP8I/yj/GP84/wT/JP8U/zT/DP8s/xz/Pv8C/"
    "yL/Ev8y/wr/Kv8a/zr/Bv8m/xb/Nv8O/y7/Hv89/wH/If8R/zH/Cf8p/xn/Of8F/yX/Ff81/w3/L"
    "f8d/z//A/8j/xP/M/8L/yv/G/87/wf/J/8X/zf/D/8v/x//PCVACMBlQACADYAFABVAGMCtwFVBr"
    "cA1QB4AjYIeAHVBHgBNgx4AzYJeQG3CXkQtg96AngPeip4BPsVeQT7VXkdeQW3DXkTtw96FngPej"
    "e3BPszeQT7c3kS/BD6AvyQ+iL8UPoS/ND6Mvw8+wL8vPtC/HL8+vwK/Ir8SvzK/Cr8qPoOeAj6IX"
    "gM+yt5DPtreRr8aPoa/Oj6Ovwc+xr8nPta/Fz7Ovzc+3r8Ovy6/Hr89vwG/Ib8RvzG/Cb8pvxm/O"
    "b8FvyW/Fb81vw2/Lb8dvz+/A78jvxO/M78Lvyu/G787vwe/J78Xvze/D78vvx+/PH8AfyB/EH8wf"
    "wh/KH8Yfzi+wd5AvtHeRH8FPoB/JT6IfxS+yH80vth/DH8sfxx/Pn8CfyJ/En8yfwp/Kn8afzp/B"
    "n8mfxZ/Nn8Ofy5/Hn89fwF/IX8RfzF/CX8pfxl/OX8FfyV/FX81fw1/LX8dfz9/A38jfxN/M38Lf"
    "yt/G387fwd/J38Xfzd/D38vfx9/PP8A/yD/EP8w/wj/KP8Y/zj/BP8k/xT/NP8M/yz/HP8+/wL/I"
    "v8S/zL/Cv8q/xr/Ov8G/yb/Fv82/w7/Lv8e/z3/Af8h/xH/Mf8J/yn/Gf85/wX/Jf8V/zX/Df8t/"
    "x3/P/8D/yP/E/8z/wv/K/8b/zv/B/8n/xf/N/8P/y//H/88=", (22, 256))


def _make_decode(enc_table: np.ndarray, num_symbols: int) -> np.ndarray:
    """Expand (length << 12) | codeword entries into the 4096-entry
    12-bit-peek decode table (length << 8) | symbol — the reference's
    committed decode tables, regenerated (verified bit-equal at
    extraction time)."""
    out = np.zeros(4096, dtype=np.uint16)
    for sym in range(num_symbols):
        info = int(enc_table[sym])
        length, code = info >> 12, info & 0xFFF
        for w in range(code, 4096, 1 << length):
            out[w] = (length << 8) | sym
    return out


LENGTH_LIMITED_UNARY_DECODING_TABLE65 = _make_decode(
    LENGTH_LIMITED_UNARY_ENCODING_TABLE65, 65)
DECODING_TABLES_FOR_HIGH_ENTROPY_BYTE = np.stack(
    [_make_decode(t, 256) for t in ENCODING_TABLES_FOR_HIGH_ENTROPY_BYTE])

_inv = np.zeros_like(COLUMN_PERMUTATIONS_FOR_ENCODING)
for _ph in range(16):
    _inv[_ph][COLUMN_PERMUTATIONS_FOR_ENCODING[_ph]] = np.arange(
        56, dtype=np.uint8)
COLUMN_PERMUTATIONS_FOR_DECODING = _inv
